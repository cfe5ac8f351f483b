#!/bin/bash
# Round-3 campaign D: lattice-CIC live-set fix, COLA end-to-end, executed
# notebooks, final-defaults bench rehearsal.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round3d start $(date -u +%FT%TZ) ===="

echo "---- [0/5] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
[ $? -ne 0 ] && { echo "TPU probe FAILED — aborting round3d"; exit 1; }

echo "---- [1/5] lattice-CIC kernel microbench (B=2 vs B=3, + correctness at 128) ----"
timeout 2400 env NSAMP=128 python scripts/microbench_lattice.py
timeout 2400 env NSAMP=256 python scripts/microbench_lattice.py

echo "---- [2/5] COLA 256^3 end-to-end (timing + P/P_lin validation) ----"
timeout 3600 python scripts/probe_cola_disp.py --nsamp 256 --box 4000

echo "---- [3/5] 256^3 bench, PURE DEFAULTS (BENCH_r03 rehearsal) ----"
timeout 1800 python bench.py --verbose

echo "---- [4/5] executed notebooks (end-to-end + Fisher) ----"
timeout 3600 python scripts/make_notebooks.py --out examples/notebooks

echo "---- [5/5] 512^3 bench, defaults ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose

echo "==== round3d end $(date -u +%FT%TZ) ===="
