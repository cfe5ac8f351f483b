#!/bin/bash
# Round-3 campaign B: subspace-PCA (oversampled + Rayleigh-Ritz) and knob
# sweep toward 100 pipelines/s at 256^3.
#   1. truth-gate check of the NEW pca_subspace at 128^3 (vs committed truth)
#   2. 256^3 bench, pca subspace
#   3. 256^3 bench, pca subspace + chain 16
#   4. 256^3 bench, exact pca + chain 16 (isolate chain effect)
#   5. 512^3 bench, pallas_draw off (vs 9.03 auto from round3a)
#   6. 512^3 bench, subspace PCA + best draw setting
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round3b start $(date -u +%FT%TZ) ===="

echo "---- [0/6] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
if [ $? -ne 0 ]; then
  echo "TPU probe FAILED — aborting round3b"
  exit 1
fi

echo "---- [1/6] truth-gate: new pca_subspace at 128^3 ----"
timeout 2400 python scripts/truth_gate.py check --truth truth_gate_128.npz \
  --variants pca_subspace --out TRUTH_GATE_SUBSPACE.json

echo "---- [2/6] 256^3 bench (pca subspace) ----"
timeout 1800 python bench.py --verbose --pca subspace

echo "---- [3/6] 256^3 bench (pca subspace, chain 16) ----"
timeout 1800 python bench.py --verbose --pca subspace --chain 16

echo "---- [4/6] 256^3 bench (exact pca, chain 16) ----"
timeout 1800 python bench.py --verbose --chain 16

echo "---- [5/6] 512^3 bench (pallas_draw off) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose --pallas-draw off

echo "---- [6/6] 512^3 bench (subspace PCA, pallas_draw auto) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose --pca subspace --pallas-draw auto

echo "==== round3b end $(date -u +%FT%TZ) ===="
