#!/bin/bash
# Round-3 campaign H: reprioritised resume of round3g (the machine rebooted
# before 3g ever started; 3e died after step 2).  Ordered so the
# highest-value results land first in case of another interruption.
# Dropped vs 3g: the 4-hour CPU f64 truth run for the opt-in box_muller
# draw (only worth it if the bm bench wins; decide from step 3/4 output).
# TPU is single-process-exclusive: everything here is strictly serialized.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round3h start $(date -u +%FT%TZ) ===="

echo "---- [0/8] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
[ $? -ne 0 ] && { echo "TPU probe FAILED — aborting round3h"; exit 1; }

echo "---- [1/8] BENCH_r03 rehearsal (pure defaults, 256^3) ----"
timeout 3600 python bench.py --verbose

echo "---- [2/8] 512^3 chain sweep (5, 6) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 5 --verbose
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 6 --verbose

echo "---- [3/8] 512^3 box_muller (chain 4) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 \
    --draw-method box_muller --verbose

echo "---- [4/8] 256^3 box_muller ----"
timeout 1800 python bench.py --draw-method box_muller --verbose

echo "---- [5/8] COLA 256^3 steady-state timing (compile cached) ----"
timeout 3600 python scripts/probe_cola_disp.py --nsamp 256 --box 4000 --repeat 3

echo "---- [6/8] notebooks (fisher + end_to_end refresh + psm, TPU executed) ----"
timeout 3600 python scripts/make_notebooks.py --only fisher --out examples/notebooks
timeout 7200 python scripts/make_notebooks.py --only end_to_end,psm \
    --out examples/notebooks

echo "---- [7/8] single-chip maximum-N probe ----"
timeout 7200 python scripts/probe_maxN.py

echo "---- [8/8] 256^3 per-stage budget ----"
timeout 3600 env NSAMP=256 python scripts/profile_512.py

echo "==== round3h end $(date -u +%FT%TZ) ===="
