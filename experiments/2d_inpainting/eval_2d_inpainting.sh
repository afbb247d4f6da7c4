#!/usr/bin/env bash
# Evaluate a trained 2D inpainting checkpoint on the val split (surface
# parity with reference experiments/2d_inpainting/eval_2d_inpainting.sh).
# Usage: eval_2d_inpainting.sh <checkpoint.ckpt>
python train.py -c experiments/2d_inpainting/config/config_stinet_imageinpainting.json \
    -n "image_inpainting_eval" -m "eval" --eval valid -r "$1"
