#!/bin/bash
# Run every example driver sequentially on the live backend.
cd "$(dirname "$0")/.."
for ex in example_box example_redshift_space example_halos example_corr_fn \
          example_21cm_map example_foregrounds example_void_detection \
          example_endtoend example_fisher example_ensemble \
          example_cola_sharded; do
  echo "================ $ex ================"
  timeout 900 python examples/$ex.py 2>&1 | grep -v "xla_bridge\|WARNING" | tail -20
  echo
done
