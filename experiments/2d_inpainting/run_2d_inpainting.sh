#!/usr/bin/env bash
# 2D texture-image inpainting (hermetic: synthesizes textures if data/textures
# has no PNGs).
python train.py -c experiments/2d_inpainting/config/config_stinet_imageinpainting.json \
    -n "image_inpainting" -m "STINet on image grid graphs (TPU)"
