#!/bin/bash
# Round-3 campaign A: pallas_draw (fused on-core density draw) + defaults.
#   1. kernel statistics on hardware (incl. the new colored half draw)
#   2. 256^3 stage profile (the budget the 100/s push must attack)
#   3. 256^3 bench, shipping defaults (pallas_draw=auto, mm3d HIGH)
#   4. 256^3 bench, pallas_draw=off (isolates the draw kernel's win)
#   5. draw-statistics gate at 128^3 (on/off ensembles, z-tests)
#   6. 512^3 chained bench, shipping defaults
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round3a start $(date -u +%FT%TZ) ===="

echo "---- [0/6] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
if [ $? -ne 0 ]; then
  echo "TPU probe FAILED — aborting round3a"
  echo "==== round3a abort $(date -u +%FT%TZ) ===="
  exit 1
fi

echo "---- [1/6] kernel statistics on hardware ----"
timeout 1800 python scripts/tpu_kernel_checks.py

echo "---- [2/6] 256^3 stage profile ----"
timeout 2400 env NSAMP=256 K=8 python scripts/profile_512.py

echo "---- [3/6] 256^3 bench (defaults: pallas_draw auto) ----"
timeout 1800 python bench.py --verbose

echo "---- [4/6] 256^3 bench (pallas_draw off) ----"
timeout 1800 python bench.py --verbose --pallas-draw off

echo "---- [5/6] draw-statistics gate (128^3, 32 keys) ----"
timeout 2400 python scripts/check_pallas_draw_stats.py --nsamp 128 --keys 32

echo "---- [6/6] 512^3 chained bench (defaults) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose

echo "==== round3a end $(date -u +%FT%TZ) ===="
