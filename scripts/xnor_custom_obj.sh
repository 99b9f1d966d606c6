#!/bin/sh
# reference: bin/xnor_custom_obj.cmd (XNOR net; needs a user-trained model —
# smoke mode generates random weights like the other launchers)
. "$(dirname "$0")/_common.sh"
W=$(weights_for "$BIN/tiny-yolo-obj_xnor.cfg" tiny-yolo-obj_xnor_5000.weights)
NAMES="$BIN/data/obj.names"
[ -f "$NAMES" ] || NAMES="$BIN/coco.names"
python -m yolo2_light_tpu detector test "$NAMES" "$BIN/tiny-yolo-obj_xnor.cfg" "$W" "$BIN/dog.jpg" -thresh 0.15 -dont_show "$@"
