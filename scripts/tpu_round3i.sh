#!/bin/bash
# Round-3 campaign I: follow-up to round3h — validation refreshes for the
# code-review fixes plus the 512^3 stage budget at the shipping defaults.
# Run AFTER round3h finishes (TPU is single-process-exclusive).
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round3i start $(date -u +%FT%TZ) ===="

echo "---- [0/5] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
[ $? -ne 0 ] && { echo "TPU probe FAILED — aborting round3i"; exit 1; }

echo "---- [1/5] COLA 256^3 steady-state (per-mesh gather engine restored) ----"
timeout 3600 python scripts/probe_cola_disp.py --nsamp 256 --box 4000 --repeat 3

echo "---- [2/5] 512^3 chain=7 (4->5->6 measured 9.60->9.63->9.72, 8 gives 9.43) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 7 --verbose

echo "---- [3/5] pallas_draw stats gate refresh (64-bit kernel seed) ----"
timeout 3600 python scripts/check_pallas_draw_stats.py --nsamp 128 --keys 32 \
    --out PALLAS_DRAW_GATE.json

echo "---- [4/5] Pallas kernel spot checks (seed vector path) ----"
timeout 1800 python scripts/tpu_kernel_checks.py

echo "---- [5/5] 512^3 per-stage budget at shipping defaults ----"
timeout 3600 env NSAMP=512 python scripts/profile_512.py

echo "==== round3i end $(date -u +%FT%TZ) ===="
