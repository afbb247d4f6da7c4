#!/usr/bin/env bash
# Offline preprocessing: graph hierarchies (native QEM decimator), crops,
# geodesic-disk masks. Fan-out across scenes is process-pool based.
set -e
NAME="qem_indices_dilated_2_4_6_8_16_circlemask"
OUT="data/generated/graph_levels/$NAME"
for SPLIT in train val; do
  python -m stinet_tpu.preprocessing.cli graphs \
      --scans data/scannet/scans --out "$OUT/$SPLIT" \
      --level-params 100 30 30 30 --dilations 2 4 6 8 16 --dilation-levels 3
  python -m stinet_tpu.preprocessing.cli crops \
      --graphs "$OUT/$SPLIT" --out "$OUT/$SPLIT" --block-size 3.0 --stride 1.5
  python -m stinet_tpu.preprocessing.cli masks \
      --graphs "$OUT/$SPLIT" --out "$OUT/$SPLIT" \
      --mask-name rad_16 --radius 16 --frac-masked 0.25 --num-masks 16
done
