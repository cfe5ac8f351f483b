#!/bin/bash
# Poll the TPU tunnel until a trivial jit completes, then run the given
# campaign script.  Usage: tpu_wait_and_run.sh scripts/tpu_round3d.sh
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
CAMPAIGN="${1:-scripts/tpu_round3d.sh}"
echo "==== tpu_wait start $(date -u +%FT%TZ) for $CAMPAIGN ====" >>"$LOG"
for i in $(seq 1 100); do
    timeout 300 python - <<'PYEOF' >/dev/null 2>&1
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
assert float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))) == 140.0
PYEOF
    if [ $? -eq 0 ]; then
        echo "==== tpu_wait: tunnel OK after $i probes $(date -u +%FT%TZ) ====" >>"$LOG"
        exec bash "$CAMPAIGN"
    fi
    sleep 420
done
echo "==== tpu_wait: gave up after 100 probes $(date -u +%FT%TZ) ====" >>"$LOG"
