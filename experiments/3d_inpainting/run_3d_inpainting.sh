#!/usr/bin/env bash
# Train STINet on preprocessed ScanNet graph hierarchies (TPU).
python train.py -c experiments/3d_inpainting/config/config_stinet_surfacetextureinpainting.json \
    -n "surface_texture_inpainting" -m "STINet on 3D ScanNet scenes (TPU)"
