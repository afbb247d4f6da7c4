#!/usr/bin/env bash
python train.py -c experiments/semantic_segmentation/config/config_scmnet_segmentation.json \
    -n "segmentation" -m "SingleConvMeshNet ScanNet segmentation (TPU)"
