#!/bin/bash
# Round-3 campaign G: resume of round3e (died after step 2 when the driver
# session was killed) + the round3f consolidation, ordered so the
# highest-value results land first.  TPU is single-process-exclusive:
# everything here is strictly serialized.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round3g start $(date -u +%FT%TZ) ===="

echo "---- [0/9] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
[ $? -ne 0 ] && { echo "TPU probe FAILED — aborting round3g"; exit 1; }

echo "---- [1/9] COLA 256^3 steady-state timing (compile now cached) ----"
timeout 3600 python scripts/probe_cola_disp.py --nsamp 256 --box 4000 --repeat 3

echo "---- [2/9] box_muller draw-method bench (256^3 + 512^3) ----"
timeout 1800 python bench.py --draw-method box_muller --verbose
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 \
    --draw-method box_muller --verbose

echo "---- [3/9] 512^3 chain sweep (5, 6) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 5 --verbose
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 6 --verbose

echo "---- [4/9] fisher notebook (TPU executed) ----"
timeout 3600 python scripts/make_notebooks.py --only fisher --out examples/notebooks

echo "---- [5/9] end_to_end (cube-scan refresh) + psm notebooks ----"
timeout 7200 python scripts/make_notebooks.py --only end_to_end,psm \
    --out examples/notebooks

echo "---- [6/9] single-chip maximum-N probe ----"
timeout 7200 python scripts/probe_maxN.py

echo "---- [7/9] 256^3 per-stage budget ----"
timeout 3600 env NSAMP=256 python scripts/profile_512.py

echo "---- [8/9] BENCH_r03 rehearsal (pure defaults) ----"
timeout 3600 python bench.py --verbose

echo "---- [9/9] box_muller truth at 256^3 (CPU f64) + TPU gate check ----"
timeout 14400 env JAX_PLATFORMS=cpu python scripts/truth_gate.py truth \
    --nsamp 256 --box 4e3 --draw-method box_muller \
    --out truth_gate_256_bm.npz
timeout 3600 python scripts/truth_gate.py check \
    --truth truth_gate_256_bm.npz --variants bm_draw \
    --out TRUTH_GATE_256_BM.json

echo "==== round3g end $(date -u +%FT%TZ) ===="
