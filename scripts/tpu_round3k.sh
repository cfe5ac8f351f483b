#!/bin/bash
# Round-3 campaign K: resume of round3j, which died when the TPU worker
# crashed during the maxN pipeline-640^3 probe (log 2026-08-20 00:42).
# Established by round3j before the crash: signal maxN = 640^3
# (576^3/704^3 scoped-VMEM OOM, 768^3 HBM), pipeline maxN = 512^3.
# Remaining steps, highest value first; strictly serialized (TPU is
# single-process-exclusive), one process per step (a failed op poisons
# the client).
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round3k start $(date -u +%FT%TZ) ===="

echo "---- [0/4] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
[ $? -ne 0 ] && { echo "TPU probe FAILED — aborting round3k"; exit 1; }

echo "---- [1/4] pallas_draw stats gate refresh (64-bit kernel seed) ----"
timeout 2700 python scripts/check_pallas_draw_stats.py --nsamp 128 --keys 32 \
    --out PALLAS_DRAW_GATE.json

echo "---- [2/4] Pallas kernel spot checks (seed vector path) ----"
timeout 1800 python scripts/tpu_kernel_checks.py

echo "---- [3/4] 512^3 chain=7 ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 7 --verbose

echo "---- [4/4] 512^3 per-stage budget at shipping defaults ----"
timeout 3600 env NSAMP=512 python scripts/profile_512.py

echo "==== round3k end $(date -u +%FT%TZ) ===="
