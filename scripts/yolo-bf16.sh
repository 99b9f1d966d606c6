#!/bin/sh
# reference: bin/yolo_gpu.cmd — the GPU build's fast path; on TPU that is
# the bf16 MXU
. "$(dirname "$0")/_common.sh"
W=$(weights_for "$BIN/yolov3.cfg" yolov3.weights)
python -m yolo2_light_tpu detector test "$BIN/coco.names" "$BIN/yolov3.cfg" "$W" "$BIN/dog.jpg" -thresh 0.24 -bf16 -dont_show "$@"
