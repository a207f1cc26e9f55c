#!/bin/bash
# First-stage codec checkpoints (LDM model zoo): vq-f4 (RDM), vq-f16
# (RARM), kl-f* (optional) — the reference's
# scripts/download_first_stages.sh targets.
set -e
mkdir -p models/first_stage_models/{vq-f4,vq-f16,kl-f8}
BASE=https://ommer-lab.com/files/latent-diffusion
for m in vq-f4 vq-f16 kl-f8; do
  wget -c "$BASE/$m.zip" -O "models/first_stage_models/$m.zip" \
    || echo "fetch $m manually"
  unzip -o "models/first_stage_models/$m.zip" \
    -d "models/first_stage_models/$m" || true
done
