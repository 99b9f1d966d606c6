#!/bin/sh
# reference: bin/video_tiny-yolo.sh; pass a video path (default test.mp4)
. "$(dirname "$0")/_common.sh"
V="${1:-test.mp4}"; [ $# -gt 0 ] && shift
W=$(weights_for "$BIN/yolov3-tiny.cfg" yolov3-tiny.weights)
python -m yolo2_light_tpu detector demo "$BIN/coco.names" "$BIN/yolov3-tiny.cfg" "$W" "$V" -thresh 0.24 -dont_show "$@"
