#!/usr/bin/env bash
# Offline preprocessing for segmentation: 4-level hierarchies with labels
# (labels come from the scene ply + ScanNet aggregation json via
# stinet_tpu.utils.scannet_utils), then 3m training crops.
set -e
NAME="qem_segmentation"
OUT="data/generated/graph_levels/$NAME"
for SPLIT in train val; do
  python -m stinet_tpu.preprocessing.cli graphs \
      --scans data/scannet/scans --out "$OUT/$SPLIT" \
      --level-params 100 30 30 30
  python -m stinet_tpu.preprocessing.cli crops \
      --graphs "$OUT/$SPLIT" --out "$OUT/$SPLIT" \
      --block-size 3.0 --stride 1.5 --num-levels 4
done
