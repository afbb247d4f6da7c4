#!/usr/bin/env bash
# Evaluate a trained checkpoint on the val split; --vis dumps/show meshes.
python train.py -c experiments/3d_inpainting/config/config_stinet_surfacetextureinpainting.json \
    -n "surface_texture_inpainting_eval" -m "eval" --eval valid --vis -r "$1"
