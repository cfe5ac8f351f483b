#!/bin/bash
# Round-3 campaign F: post-round3e consolidation.
#   1. 256^3 stage budget (where do the last ms/pipeline go at the bench size)
#   2. regenerate the executed notebooks (end_to_end gained the cube-scan
#      section; psm is new — mirrors Planck_Sky_model_parameters.ipynb)
#   3. defaults re-bench rehearsal for BENCH_r03
# Edit before running if round3e's bm_draw gate/bench changes the defaults.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round3f start $(date -u +%FT%TZ) ===="

echo "---- [0/3] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
[ $? -ne 0 ] && { echo "TPU probe FAILED — aborting round3f"; exit 1; }

echo "---- [1/3] 256^3 per-stage budget ----"
timeout 3600 env NSAMP=256 python scripts/profile_512.py

echo "---- [2/3] executed notebooks (end_to_end refresh + psm) ----"
timeout 7200 python scripts/make_notebooks.py --only end_to_end,psm \
    --out examples/notebooks

echo "---- [3/3] BENCH_r03 rehearsal (pure defaults) ----"
timeout 3600 python bench.py --verbose

echo "==== round3f end $(date -u +%FT%TZ) ===="
