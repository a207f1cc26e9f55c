#!/bin/bash
# Fetch the released RDM/RARM checkpoints (torch .ckpt) into the layout
# this framework's pipelines expect. URLs are the reference release
# targets (reference scripts/download_models.sh); conversion to JAX
# happens automatically at load time (rdm_tpu.utils.torch_convert) when
# model.ckpt sits beside config.yaml.
#
# Resumable (wget -c). DRY_RUN=1 prints the fetch plan without network
# (this build environment is egress-free).
set -u
BASE=https://ommer-lab.com/files/rdm/models
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
# model -> repo config installed beside the checkpoint (from_model_dir
# loads <model_dir>/config.yaml). imagenet_in-db is the imagenet model
# served against the in-database retrieval index -> same model config.
MODELS="
rdm/imagenet:configs/rdm/imagenet.yaml
rdm/imagenet_in-db:configs/rdm/imagenet.yaml
rdm/ffhq:configs/rdm/ffhq.yaml
rarm/imagenet/dogs:configs/rarm/dogs.yaml
rarm/imagenet/mammals:configs/rarm/mammals.yaml
rarm/imagenet/animals:configs/rarm/animals.yaml
"
fail=0
for entry in $MODELS; do
  m="${entry%%:*}"
  cfg="$REPO_ROOT/${entry#*:}"
  dest="models/$m"
  url="$BASE/$m/model.ckpt"
  if [ "${DRY_RUN:-0}" = "1" ]; then
    echo "would fetch $url -> $dest/model.ckpt"
    echo "would copy ${entry#*:} -> $dest/config.yaml"
    continue
  fi
  mkdir -p "$dest"
  if ! wget -c -P "$dest/" "$url"; then
    echo "FAILED: $url (re-run to resume, or fetch manually)" >&2
    fail=1
  fi
  # install the config only beside a real checkpoint — a config.yaml
  # alone would make the dir look initialized to from_model_dir users
  if [ -f "$dest/model.ckpt" ] && [ ! -f "$dest/config.yaml" ]; then
    cp "$cfg" "$dest/config.yaml" || fail=1
  fi
done
if [ "${DRY_RUN:-0}" != "1" ]; then
  echo "--- downloaded checkpoints:"
  find models -name model.ckpt -exec du -h {} \; 2>/dev/null
  echo "Convert a checkpoint ahead of time (optional; load-time is automatic):"
  echo "  python scripts/convert_checkpoint.py --kind rdm --ckpt models/rdm/imagenet/model.ckpt --out models/rdm/imagenet/jax"
fi
exit $fail
