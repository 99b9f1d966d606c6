#!/bin/sh
# reference: bin/tiny-yolo-int8.sh
. "$(dirname "$0")/_common.sh"
W=$(weights_for "$BIN/yolov3-tiny.cfg" yolov3-tiny.weights)
python -m yolo2_light_tpu detector test "$BIN/coco.names" "$BIN/yolov3-tiny.cfg" "$W" "$BIN/dog.jpg" -thresh 0.24 -quantized -dont_show "$@"
