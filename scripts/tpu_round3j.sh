#!/bin/bash
# Round-3 campaign J: resume of the interrupted round3h step 7 plus
# round3i (which never started).  Highest-value steps first in case of
# interruption.  TPU is single-process-exclusive: strictly serialized.
#   1. COLA 256^3 steady-state — per-mesh gather engine restored as the
#      default (the fused 3-mesh gather OOMed scoped VMEM in-engine,
#      commit 2b3ac1a), validates the B=3 cliff fix end-to-end.
#   2. single-chip maximum-N probe (was interrupted at 576^3).
#   3. pallas_draw stats gate refresh (the 64-bit kernel seed in
#      a2d894c changes the draw stream; PALLAS_DRAW_GATE.json is stale).
#   4. Pallas kernel spot checks (seed vector path).
#   5. 512^3 chain=7 (4->5->6 measured 9.60->9.63->9.72; 8 gives 9.43).
#   6. 512^3 per-stage budget at shipping defaults.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round3j start $(date -u +%FT%TZ) ===="

echo "---- [0/6] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
[ $? -ne 0 ] && { echo "TPU probe FAILED — aborting round3j"; exit 1; }

echo "---- [1/6] COLA 256^3 steady-state (per-mesh gather engine) ----"
timeout 2700 python scripts/probe_cola_disp.py --nsamp 256 --box 4000 --repeat 3

echo "---- [2/6] single-chip maximum-N probe (resume) ----"
timeout 5400 python scripts/probe_maxN.py --sizes 576 640 704 768

echo "---- [3/6] pallas_draw stats gate refresh (64-bit kernel seed) ----"
timeout 2700 python scripts/check_pallas_draw_stats.py --nsamp 128 --keys 32 \
    --out PALLAS_DRAW_GATE.json

echo "---- [4/6] Pallas kernel spot checks (seed vector path) ----"
timeout 1800 python scripts/tpu_kernel_checks.py

echo "---- [5/6] 512^3 chain=7 ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 7 --verbose

echo "---- [6/6] 512^3 per-stage budget at shipping defaults ----"
timeout 3600 env NSAMP=512 python scripts/profile_512.py

echo "==== round3j end $(date -u +%FT%TZ) ===="
