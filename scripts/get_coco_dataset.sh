#!/bin/bash
# Fetch the COCO-2014 eval assets from the same public mirrors the reference
# project documents, laid out for this repo's `detector map` (.data `valid=`
# list + labels/ ground truth). Needs network access — run on a connected
# machine, then point a .data file at the produced list:
#
#   valid = <dest>/coco/5k.txt
#   names = /root/reference/bin/coco.names
set -euo pipefail
DEST="${1:-.}"
MIRROR="https://pjreddie.com/media/files"

mkdir -p "$DEST/coco/images"
cd "$DEST/coco"

fetch() { wget -c "$1"; }

(
    cd images
    for z in train2014 val2014; do
        fetch "$MIRROR/$z.zip"
        unzip -q "$z.zip"
    done
)

for f in instances_train-val2014.zip coco/5k.part coco/trainvalno5k.part \
         coco/labels.tgz; do
    fetch "$MIRROR/$f"
done
tar xzf labels.tgz
unzip -q instances_train-val2014.zip

# .data `valid=` lists want absolute image paths
for part in 5k trainvalno5k; do
    sed "s|^|$PWD/|" "$part.part" > "$part.txt"
done

echo "done: use valid=$PWD/5k.txt in your .data file" >&2
