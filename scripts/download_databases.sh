#!/bin/bash
# Fetch the released retrieval databases (CLIP-embedding npz chunks) and
# nn-memory pickles. URLs are the reference release targets (reference
# scripts/download_databases.sh). The npz chunks load directly via
# rdm_tpu.retrieval.database.DataPool; nn_memory/*.p via NNMemory.load.
#   database/ImageNet:   1,281,200 x 512 embeddings, 1 chunk (~1.2 GB)
#   database/OpenImages: ~20.9M x 512 in 10 chunks (~18 GB)
#   nn_memory/*.p:       neighbor-frequency pickles per train pairing
#
# Resumable (wget -c). DRY_RUN=1 prints the fetch plan without network
# (this build environment is egress-free). Alternatively build your own
# database: python scripts/search_neighbors.py --build_filelist ...
set -u
BASE=https://ommer-lab.com/files/rdm
FILES="
database/ImageNet/1281200x512-part_1.npz
database/OpenImages/1999998x512-part_2.npz
database/OpenImages/1999998x512-part_3.npz
database/OpenImages/1999998x512-part_4.npz
database/OpenImages/1999998x512-part_5.npz
database/OpenImages/1999998x512-part_7.npz
database/OpenImages/1999998x512-part_8.npz
database/OpenImages/1999998x512-part_9.npz
database/OpenImages/1999998x512-part_10.npz
database/OpenImages/2000097x512-part_1.npz
database/OpenImages/2927826x512-part_6.npz
nn_memory/in_imagenet.p
nn_memory/oi_ffhq.p
nn_memory/oi_imagenet-animals.p
nn_memory/oi_imagenet-dogs.p
nn_memory/oi_imagenet-mammals.p
nn_memory/oi_imagenet.p
"
fail=0
for f in $FILES; do
  dest="$(dirname "$f")"
  url="$BASE/$f"
  if [ "${DRY_RUN:-0}" = "1" ]; then
    echo "would fetch $url -> $f"
    continue
  fi
  mkdir -p "$dest"
  if ! wget -c -P "$dest/" "$url"; then
    echo "FAILED: $url (re-run to resume, or fetch manually)" >&2
    fail=1
  fi
done
exit $fail
