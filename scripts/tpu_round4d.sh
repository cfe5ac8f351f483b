#!/bin/bash
# Round-4 campaign D: second-wave perf levers, priority-ordered so a
# timeout cut loses only diagnostics.
#  - pca_precision=HIGH (gate + bench): GEMMs ship HIGHEST because
#    DEFAULT failed the round-3 gate; HIGH (bf16x3, ~2.4e-7/element)
#    was never tried and halves the GEMM cost.
#  - binned_pk v2 (hoisted counts; bit-identical) + gated telescoped.
#  - COLA fused gather bands<=2 (new default; B=3 fused OOMs scoped
#    VMEM — round4c step 8).
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round4d start $(date -u +%FT%TZ) ===="

echo "---- [0/8] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
[ $? -ne 0 ] && { echo "TPU probe FAILED — aborting round4d"; exit 1; }

echo "---- [1/8] truth gate 256^3: pca_high + pk_v2t ----"
timeout 5400 python scripts/truth_gate.py check --truth truth_gate_256.npz \
    --variants pca_high,pk_v2t \
    --out TRUTH_GATE_256_R4D.json

echo "---- [2/8] bench 256^3 pca HIGH + binned-pk v2 (candidate defaults) ----"
timeout 3600 python bench.py --nsamp 256 --iters 16 --pca-precision HIGH \
    --pallas-pk v2 --verbose

echo "---- [3/8] bench 512^3 pca HIGH + v2, chain=6 ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 6 \
    --pca-precision HIGH --pallas-pk v2 --verbose

echo "---- [4/8] COLA steady state: fused gather bands<=2 (the new default) ----"
timeout 3600 python scripts/probe_cola_disp.py --nsamp 256 --box 4000 \
    --fuse 2 --repeat 3

echo "---- [5/8] COLA fused + force-FFT HIGH ----"
timeout 3600 python scripts/probe_cola_disp.py --nsamp 256 --box 4000 \
    --fuse 2 --fft-precision HIGH --repeat 3

echo "---- [6/8] binned_pk kernel microbench 512^3 + 256^3 ----"
timeout 2700 env NSAMP=512 K=8 python scripts/microbench_binned_pk.py
timeout 2700 env NSAMP=256 K=8 python scripts/microbench_binned_pk.py

echo "---- [7/8] eigh-hoist phase diagnostics 256^3 ----"
timeout 3600 python scripts/probe_hoist_phases.py --nsamp 256

echo "---- [8/8] bench 256^3 single-lever control: pca HIGH only ----"
timeout 3600 python bench.py --nsamp 256 --iters 16 --pca-precision HIGH --verbose

echo "==== round4d end $(date -u +%FT%TZ) ===="
