#!/bin/bash
# Released checkpoint layout expected by this framework (the reference's
# scripts/download_models.sh targets; convert with
# rdm_tpu.utils.torch_convert at load time — pipelines do this
# automatically when model.ckpt sits beside config.yaml).
#
# This build environment is egress-free; on a connected machine:
set -e
mkdir -p models/rdm/{imagenet,ffhq} models/rarm/imagenet/{dogs,mammals,animals}
BASE=https://ommer-lab.com/files/rdm
for m in rdm/imagenet rdm/ffhq rarm/imagenet/dogs rarm/imagenet/mammals rarm/imagenet/animals; do
  wget -c "$BASE/$(basename $m).zip" -O "models/$m.zip" || echo "fetch models/$m manually"
  unzip -o "models/$m.zip" -d "models/$m" || true
done
echo "Also fetch OpenAI CLIP ViT-B/32 to models/clip/ViT-B-32.pt"
