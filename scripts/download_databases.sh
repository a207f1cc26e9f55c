#!/bin/bash
# Retrieval databases + nn-memories (the reference's
# scripts/download_databases.sh targets). The npz chunk format loads
# directly via rdm_tpu.retrieval.database.DataPool.load.
#   database/imagenet:    1,281,200 x 512 CLIP embeddings (1.2 GB)
#   database/openimages:  ~20.9M x 512 in 10 npz chunks (18 GB)
#   nn_memory/*.p:        top-M neighbor-frequency pickles
set -e
mkdir -p database/{imagenet,openimages} nn_memory
BASE=https://ommer-lab.com/files/rdm
wget -c "$BASE/databases/imagenet.zip" -O database/imagenet.zip || true
wget -c "$BASE/databases/openimages.zip" -O database/openimages.zip || true
wget -c "$BASE/nn_memory.zip" -O nn_memory.zip || true
for z in database/imagenet.zip database/openimages.zip nn_memory.zip; do
  [ -f "$z" ] && unzip -o "$z" -d "$(dirname $z)" || true
done
# alternatively, build your own database:
#   python scripts/search_neighbors.py --build_filelist ... --database ...
