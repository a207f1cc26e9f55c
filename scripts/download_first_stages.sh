#!/bin/bash
# Fetch the first-stage codec checkpoints (LDM model zoo): vq-f4 (RDM
# pixel decode), vq-f16 (RARM token codec), kl-f* optional. URLs are the
# reference release targets (reference scripts/download_first_stages.sh).
#
# Resumable (wget -c). DRY_RUN=1 prints the fetch plan without network
# (this build environment is egress-free). Pass model names as args to
# fetch a subset, e.g.: scripts/download_first_stages.sh vq-f4 vq-f16
set -u
BASE=https://ommer-lab.com/files/latent-diffusion
DEFAULT="kl-f4 kl-f8 kl-f16 kl-f32 vq-f4 vq-f4-noattn vq-f8 vq-f8-n256 vq-f16"
MODELS="${*:-$DEFAULT}"
fail=0
for m in $MODELS; do
  dest="models/first_stage_models/$m"
  url="$BASE/$m.zip"
  if [ "${DRY_RUN:-0}" = "1" ]; then
    echo "would fetch $url -> $dest/ (unzipped)"
    continue
  fi
  mkdir -p "$dest"
  if wget -c -O "$dest/model.zip" "$url"; then
    if ! (cd "$dest" && unzip -o model.zip && rm -f model.zip); then
      echo "FAILED to extract $dest/model.zip (corrupt/truncated?" \
           "delete it and re-run)" >&2
      fail=1
    fi
  else
    echo "FAILED: $url (re-run to resume, or fetch manually)" >&2
    fail=1
  fi
done
exit $fail
