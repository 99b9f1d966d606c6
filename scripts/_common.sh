# Shared prolog for the launcher scripts (TPU-native analogs of the
# reference's bin/*.sh and bin/*.cmd smoke scripts — see scripts/README.md).
#
# Resolves assets the same way the reference does (cfg/names/dog.jpg live
# next to the launcher, here the read-only reference bin/) and falls back to
# deterministic random weights when the named .weights file is absent (this
# image ships no trained weights), so every script still smoke-runs the full
# stack end-to-end.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
BIN="${BIN:-/root/reference/bin}"
cd "$REPO"

# weights_for <cfg-path> <weights-basename> -> echoes a usable weights path
weights_for() {
    local cfg="$1" w="$BIN/$2"
    if [ -f "$w" ]; then
        echo "$w"
        return
    fi
    local gendir="${TMPDIR:-/tmp}/yolo2_light_tpu_weights"
    local gen="$gendir/$2"
    if [ ! -f "$gen" ]; then
        mkdir -p "$gendir"
        echo "note: $w not found — generating deterministic random weights" \
             "(smoke mode; detections will be meaningless)" >&2
        # write-then-rename: an interrupted generation must not leave a
        # truncated file that later runs would reuse
        python - "$cfg" "$gen.tmp.$$" <<'EOF'
import sys
from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.weights import random_params, save_weights
cfg, out = sys.argv[1], sys.argv[2]
spec = parse_network_cfg(cfg, batch=1)
save_weights(spec, random_params(spec, seed=7), out)
EOF
        mv "$gen.tmp.$$" "$gen"
    fi
    echo "$gen"
}
