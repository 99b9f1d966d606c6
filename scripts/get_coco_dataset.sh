#!/bin/bash
# Fetch the COCO-2014 eval assets the same way the reference's
# bin/data/get_coco_dataset.sh does (same mirrors), laid out for this repo's
# `detector map` (.data `valid=` list + labels/ ground truth). Needs network
# access — run it on a connected machine, then point a .data file at the
# produced 5k.txt:
#
#   valid = <dest>/coco/5k.txt
#   names = /root/reference/bin/coco.names
set -e
DEST="${1:-.}"
cd "$DEST"

git clone https://github.com/pdollar/coco
cd coco

mkdir -p images
cd images
wget -c https://pjreddie.com/media/files/train2014.zip
wget -c https://pjreddie.com/media/files/val2014.zip
unzip -q train2014.zip
unzip -q val2014.zip
cd ..

wget -c https://pjreddie.com/media/files/instances_train-val2014.zip
wget -c https://pjreddie.com/media/files/coco/5k.part
wget -c https://pjreddie.com/media/files/coco/trainvalno5k.part
wget -c https://pjreddie.com/media/files/coco/labels.tgz
tar xzf labels.tgz
unzip -q instances_train-val2014.zip

# absolute-path image lists (what `valid=` in a .data file expects)
paste <(awk "{print \"$PWD\"}" <5k.part) 5k.part | tr -d '\t' > 5k.txt
paste <(awk "{print \"$PWD\"}" <trainvalno5k.part) trainvalno5k.part \
    | tr -d '\t' > trainvalno5k.txt

echo "done: use valid=$PWD/5k.txt in your .data file" >&2
