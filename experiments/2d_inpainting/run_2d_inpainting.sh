#!/usr/bin/env bash
# 2D texture-image inpainting (hermetic data: synthesizes textures if
# data/textures has no PNGs).
#
# The default config is FAITHFUL to the reference: FID/LPIPS require
# pretrained weights converted offline (utils/convert_perceptual_weights.py)
# and the run fails fast if trainer.{inception,lpips}_weights are unset.
# HERMETIC=1 switches to the random-feature variant (scalars tagged
# *_random_features — relative trends only, for sandboxes/CI without
# downloaded weights).
CFG=experiments/2d_inpainting/config/config_stinet_imageinpainting.json
if [ "${HERMETIC:-0}" = "1" ]; then
    CFG=experiments/2d_inpainting/config/config_stinet_imageinpainting_hermetic.json
fi
python train.py -c "$CFG" \
    -n "image_inpainting" -m "STINet on image grid graphs (TPU)"
