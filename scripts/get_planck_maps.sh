#!/usr/bin/env bash
# Fetch the three Planck FFP10 simulation maps the PlanckSkyModel ingests
# (reference scripts/get_planck_maps.sh:1-10; ~2.5 GB total).
#
# Usage: scripts/get_planck_maps.sh [DEST_DIR]
# Then point PlanckSkyModel at them:
#   PlanckSkyModel(box, planck_sim_paths={
#       "ff217":   "<DEST>/COM_SimMap_freefree-ffp10-skyinbands-217_2048_R3.00_full.fits",
#       "sync217": "<DEST>/COM_SimMap_synchrotron-ffp10-skyinbands-217_2048_R3.00_full.fits",
#       "sync353": "<DEST>/COM_SimMap_synchrotron-ffp10-skyinbands-353_2048_R3.00_full.fits",
#   })
set -euo pipefail

dest="${1:-planck_maps}"
mkdir -p "$dest"
base="http://pla.esac.esa.int/pla/aio/product-action?SIMULATED_MAP.FILE_ID="

files=(
  COM_SimMap_freefree-ffp10-skyinbands-217_2048_R3.00_full.fits
  COM_SimMap_synchrotron-ffp10-skyinbands-217_2048_R3.00_full.fits
  COM_SimMap_synchrotron-ffp10-skyinbands-353_2048_R3.00_full.fits
)

echo "Fetching ${#files[@]} Planck FFP10 maps into $dest (~2.5 GB)"
for f in "${files[@]}"; do
  if [ -s "$dest/$f" ]; then
    echo "  $f already present, skipping"
    continue
  fi
  echo "  $f ..."
  if command -v curl >/dev/null 2>&1; then
    curl -fL -o "$dest/$f" "$base$f"
  else
    wget -O "$dest/$f" "$base$f"
  fi
done
echo "Done."
