"""Generative fuzz: random VALID darknet cfgs through our CLI vs the oracle.
Strict separate-stream diffs (stdout mod timing; stderr exact).

Tool usage:  python tests/fuzz_cfgs.py [n_nets] [seed0]
A small campaign runs in the suite via test_fuzz_parity.py (slow mark);
~170 random nets x {fp32, quantized} passed when added (2026-08-18); it
caught the xnor+quantized dispatch-precedence bug and two mAP accounting
parity bugs the fixed-fixture tests never hit.
Needs the compiled oracle at .oracle/darknet (built by tests/conftest.py).

Known irreducible class (map aggregates): per-detection boxes can differ from
the oracle below print precision (libm expf/sigmoid vs XLA exp differ by
ULPs), so an aggregate like average IoU summed over thousands of records can
land on the other side of a %2.2f rounding boundary (observed once in 16
fuzzed map runs: 0.06 vs 0.05). Detection lines themselves always match.
"""
import os
import random
import re
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from PIL import Image
from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.weights import random_params, save_weights

ORACLE = "/root/repo/.oracle/darknet"
OUT = os.environ.get("FUZZ_OUT", "/tmp/fuzz/gen")
os.makedirs(OUT, exist_ok=True)


def gen_cfg(rng, classes=3, calib_mode=False):
    """Random stack of conv/maxpool/route/upsample/shortcut/reorg ending in a
    yolo or region head, with coherent dims.

    ``calib_mode``: restrict to the layer set the REFERENCE's calibration
    forward executes — conv/maxpool/route/reorg + region head, no xnor
    (src/yolov2_forward_network_quantized.c's calibration path; anything
    else segfaults the oracle's `detector calibrate`, which is why the
    fixed fixture tests/data/mini-calib.cfg has the same restriction)."""
    w = h = int(rng.choice([32, 48, 64]))
    lines = [f"[net]\nbatch=1\nwidth={w}\nheight={h}\nchannels=3\n"
             "learning_rate=0.001\nmomentum=0.9\ndecay=0.0001\npolicy=constant\n"
             "max_batches=1\n"]
    # track (w, h, c) per layer for valid routes/shortcuts
    dims = []
    cur = (w, h, 3)

    def conv(filters, size, stride, act="leaky", extra="", pad=None):
        nonlocal cur
        # random XNOR convs (never the first layer or a head-feeding linear
        # conv): exercises the bit path's -1 border rule and c%32 packing
        if act == "leaky" and dims and not calib_mode and rng.rand() < 0.25:
            extra += "xnor=1\n"
        if pad is None:
            pad = 1 if rng.rand() < 0.85 or size == 1 else 0
        padding = (size // 2) if pad else 0
        lines.append(f"[convolutional]\nbatch_normalize=1\nfilters={filters}\n"
                     f"size={size}\nstride={stride}\npad={pad}\nactivation={act}\n"
                     + extra)
        w0, h0, _ = cur
        cur = ((w0 + 2 * padding - size) // stride + 1,
               (h0 + 2 * padding - size) // stride + 1, filters)
        dims.append(cur)

    n_body = rng.randint(4, 10)
    conv(int(rng.choice([8, 16])), 3, 1, pad=1)
    for _ in range(n_body):
        r = rng.rand()
        if r < 0.45 or len(dims) < 2:
            conv(int(rng.choice([8, 16, 24, 32]) or 16),
                 int(rng.choice([1, 3])), 1)
        elif r < 0.55 and cur[0] >= 8:
            # downsample: 2x2/2 maxpool, stride-1 "same" maxpool (the
            # yolov3-tiny quirk), or a stride-2 conv
            rr = rng.rand()
            if rr < 0.5:
                size, stride = 2, 2
            elif rr < 0.75:
                size, stride = 2, 1
            else:
                conv(int(rng.choice([16, 32])), 3, 2)
                continue
            lines.append(f"[maxpool]\nsize={size}\nstride={stride}\n")
            cur = ((cur[0] + (size - 1) - size) // stride + 1,
                   (cur[1] + (size - 1) - size) // stride + 1, cur[2])
            dims.append(cur)
        elif r < 0.7:
            # shortcut to a same-shaped earlier layer if one exists
            cands = [i for i, d in enumerate(dims[:-1]) if d == cur]
            if not cands or calib_mode:
                conv(16, 1, 1)
                continue
            frm = int(rng.choice(cands))
            lines.append(f"[shortcut]\nfrom={frm}\nactivation=linear\n")
            dims.append(cur)
        elif r < 0.85:
            # route to 1-2 earlier layers with matching spatial dims
            cands = [i for i, d in enumerate(dims)
                     if d[0] == cur[0] and d[1] == cur[1]]
            if not cands:
                conv(16, 1, 1)
                continue
            picks = [int(rng.choice(cands))]
            if rng.rand() < 0.5 and len(cands) > 1:
                picks.append(int(rng.choice(cands)))
            lines.append("[route]\nlayers=" + ",".join(map(str, picks)) + "\n")
            c = sum(dims[i][2] for i in picks)
            cur = (dims[picks[0]][0], dims[picks[0]][1], c)
            dims.append(cur)
        elif r < 0.93 and cur[0] <= 16 and not calib_mode:
            lines.append("[upsample]\nstride=2\n")
            cur = (cur[0] * 2, cur[1] * 2, cur[2])
            dims.append(cur)
        else:
            if cur[0] % 2 == 0 and cur[2] >= 1:
                lines.append("[reorg]\nstride=2\n")
                cur = (cur[0] // 2, cur[1] // 2, cur[2] * 4)
                dims.append(cur)
            else:
                conv(16, 3, 1)

    # head(s)
    if not calib_mode and rng.rand() < 0.6:
        n_mask = 3
        anchors = ",".join(f"{rng.randint(5, 60)},{rng.randint(5, 60)}"
                           for _ in range(6))

        def yolo_head(mask):
            conv(n_mask * (classes + 5), 1, 1, act="linear", pad=1)
            lines.append(f"[yolo]\nmask = {mask}\nanchors = {anchors}\n"
                         f"classes={classes}\nnum=6\njitter=.3\n"
                         "ignore_thresh = .7\ntruth_thresh = 1\nrandom=1\n")
            dims.append(None)   # the yolo layer occupies a layer index

        yolo_head("0,1,2")
        if rng.rand() < 0.4:
            # second head, yolov3-style (yolov3.cfg routes back past its
            # yolo layers): route to a random mid layer, optional upsample,
            # 1-2 convs, then mask 3,4,5 on the SAME anchors — fuzzes
            # multi-head decode concat order, per-head candidate counting,
            # and the yolo-lookahead quantization disable on BOTH head convs
            cands = [i for i, d in enumerate(dims) if d is not None]
            k = int(rng.choice(cands))
            lines.append(f"[route]\nlayers={k}\n")
            cur = dims[k]
            dims.append(cur)
            if rng.rand() < 0.5 and cur[0] <= 16:
                lines.append("[upsample]\nstride=2\n")
                cur = (cur[0] * 2, cur[1] * 2, cur[2])
                dims.append(cur)
            for _ in range(int(rng.randint(1, 3))):
                conv(int(rng.choice([8, 16, 24])), int(rng.choice([1, 3])), 1)
            yolo_head("3,4,5")
    else:
        num = 3
        conv(num * (classes + 5), 1, 1, act="linear", pad=1)
        anchors = ",".join(f"{rng.uniform(0.5, 4):.2f}" for _ in range(6))
        lines.append(f"[region]\nanchors = {anchors}\nbias_match=1\n"
                     f"classes={classes}\ncoords=4\nnum={num}\nsoftmax=1\n"
                     "jitter=.3\nrescore=1\nobject_scale=5\n"
                     "noobject_scale=1\nclass_scale=1\ncoord_scale=1\n"
                     "absolute=1\nthresh = .6\nrandom=1\n")
    return "\n".join(lines)



def _ulp_class_only(oracle_lines, ours_lines, residue_out=None,
                    thresh_pct=30):
    """True iff the text diff is explained by the irreducible float-noise
    classes (sub-ULP XLA-vs-libm sigmoid/FMA differences):

    * "near" pairs — same class within 1% confidence and 1 count per
      coordinate, or <= 1e-5 RELATIVE per coordinate at exp-amplified
      magnitudes (print-boundary rounding; near-equal left-edge
      reordering).
      Pairs whose every differing field sits at |value| >= 1e4 are
      SUB-PRECISION (a 1-count flip there is <= 1e-4 relative — far below
      print precision; degenerate exp-amplified nets produce boxes ~1e6
      counts tall where each field flips with O(1) probability) and do not
      count against the 5% precision cap — only the overall 10% residue
      bound; pairs with a differing field at print precision are capped
      at 5%.
    * "nms_tie" pairs — mutually-overlapping boxes with tied confidences:
      an NMS sort-order flip where either survivor is a valid outcome.
    * "suppression" singletons — an UNPAIRED det (line-count delta): a
      suppression decision flipped at the IoU-vs-nms-threshold boundary
      (the same class quantified record-by-record on the 52k-det map net —
      see _map_noise_only). Budget max(1, n/100); each singleton must
      overlap a same-class det of >= its confidence in its own stream (its
      would-be suppressor, which printing proves survived).

    Secondary class lines ("name: NN%", no box) carry the same
    %-print-boundary noise model and must pair name-for-name within 1%
    (previously ignored entirely — round-5 review); an unpaired extras line
    needs its pct at the detect threshold (``thresh_pct``, a
    threshold-existence flip) or an accepted suppression singleton to ride.

    ``residue_out`` (list): receives ``(oracle_det, ours_det, kind)`` pairs
    (for "suppression": ``(singleton, side, kind)`` with side in
    {"oracle","ours"}) — the f64 confirming pass (_confirm_f64) checks
    boundary adjacency on the "near" ones and nms-threshold adjacency of
    the raw IoU on ours-side "suppression" ones."""
    from collections import Counter
    from util_parity import parse_detection_lines
    a, ea = parse_detection_lines("\n".join(oracle_lines))
    b, eb = parse_detection_lines("\n".join(ours_lines))
    singles_budget = max(1, len(a) // 100)
    if abs(len(a) - len(b)) > singles_budget:
        return False

    def boxes_overlap(d, e, thr=0.3):
        # printed-int IoU over (left, top, w, h) fields
        ax1, ay1, aw, ah = d[2:6]
        bx1, by1, bw, bh = e[2:6]
        iw = min(ax1 + aw, bx1 + bw) - max(ax1, bx1)
        ih = min(ay1 + ah, by1 + bh) - max(ay1, by1)
        if iw <= 0 or ih <= 0:
            return False
        inter = iw * ih
        union = aw * ah + bw * bh - inter
        return union > 0 and inter / union > thr

    # cancel exact matches first (greedy tolerant matching over the full
    # dense set can mispair and false-negative); only the residue needs the
    # +-1 tolerance
    ca, cb = Counter(a), Counter(b)
    ra = sorted((ca - cb).elements())
    rb = sorted((cb - ca).elements())
    # computational guard only (O(ra*rb) pairing): the real gating is the
    # per-pair field bounds, the 5% print-precision cap, and the 1%
    # singleton budget below — an exp-degenerate net legitimately flips
    # 10-20% of its huge fields (each is ~1e-6-relative noise), so a
    # relative early cap here would reject plausible noise wholesale
    if max(len(ra), len(rb)) > 400:
        return False
    rem = list(rb)
    singles = []                          # unpaired residue, either side
    n_precise = 0                         # paired residue at print precision
    n_tie = 0                             # nms sort-order tie pairs
    for d in ra:
        hit = kind = None
        for i, e in enumerate(rem):
            # per-coordinate: 1 count at print precision, or <= 1e-5
            # RELATIVE at exp-amplified magnitudes (a ~1e-6-relative ULP
            # divergence on a 1.4e6-count box moves the printed int by
            # several counts — still orders of magnitude below any real
            # formula bug, which is % off)
            near = (e[0] == d[0] and abs(e[1] - d[1]) <= 1
                    and all(abs(e[j] - d[j])
                            <= max(1, 1e-5 * max(abs(e[j]), abs(d[j])))
                            for j in range(2, 6)))
            nms_tie = (e[0] == d[0] and abs(e[1] - d[1]) <= 1
                       and boxes_overlap(d, e))
            if near or nms_tie:
                hit, kind = i, ("near" if near else "nms_tie")
                break
        if hit is None:
            singles.append(("oracle", d))
            continue
        e = rem.pop(hit)
        if kind == "nms_tie":
            n_tie += 1
        elif any(e[j] != d[j] and max(abs(e[j]), abs(d[j])) < 1e4
                 for j in range(1, 6)):
            n_precise += 1
        if residue_out is not None:
            residue_out.append((d, e, kind))
    singles += [("ours", e) for e in rem]
    if n_precise > max(2, len(a) // 20):
        return False
    # tie flips are RARE (2 in 52k comparisons on the tie-degenerate map
    # net): a systematic coordinate error also pairs as same-class
    # equal-conf heavy-overlap, so an uncapped tie class would mask it
    # (round-5 review follow-up)
    if n_tie > max(2, len(a) // 50):
        return False
    if len(singles) > singles_budget:
        return False
    for side, s in singles:
        pool = a if side == "oracle" else b
        # the would-be suppressor must be a DIFFERENT same-class det of
        # >= confidence with real overlap (printed-int IoU > 0.05); an
        # exact-duplicate line can never be a threshold-boundary flip —
        # IoU 1.0 is nowhere near the nms threshold — so e == s never
        # qualifies (round-5 review hardening). The f64 confirming pass
        # additionally requires the RAW IoU to sit AT the nms threshold.
        for e in pool:
            if e == s:
                continue
            if (e[0] == s[0] and e[1] >= s[1] - 1
                    and boxes_overlap(s, e, thr=0.05)):
                break
        else:
            return False                  # no would-be suppressor in sight
        if residue_out is not None:
            residue_out.append((s, side, "suppression"))

    # secondary class lines: pair name-for-name within 1%. An UNPAIRED line
    # is acceptable only as (i) a detection-threshold boundary flip — the
    # class prob sits at the print/detect threshold (|pct-thresh_pct| <= 1),
    # the one f32-noise mechanism that changes an extras line's EXISTENCE
    # without a det-count change — or (ii) a ride-along of an accepted
    # suppression-flip det (<= 2 per singleton: its other classes above
    # thresh print with it). A dropped/garbled extras line with matched
    # dets and no such linkage is a real bug (round-5 review).
    cea, ceb = Counter(ea), Counter(eb)
    rea = sorted((cea - ceb).elements())
    reb = list(sorted((ceb - cea).elements()))
    paired = 0
    leftovers = []
    for d in rea:
        hit = next((i for i, e in enumerate(reb)
                    if e[0] == d[0] and abs(e[1] - d[1]) <= 1), None)
        if hit is None:
            leftovers.append(d)
            continue
        reb.pop(hit)
        paired += 1
    leftovers += reb
    ride_budget = 2 * len(singles)
    for d in leftovers:
        if abs(d[1] - thresh_pct) <= 1:
            continue
        if ride_budget > 0:
            ride_budget -= 1
            continue
        return False
    if paired > max(2, len(ea) // 20):
        return False
    return True


def _iou_ltwh(a, b) -> float:
    """IoU of two (left, top, w, h) float boxes (format-invariant vs the
    reference's center-format box_iou, box.c:124-134)."""
    ax, ay, aw, ah = a
    bx, by, bw, bh = b
    iw = min(ax + aw, bx + bw) - max(ax, bx)
    ih = min(ay + ah, by + bh) - max(ay, by)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    union = aw * ah + bw * bh - inter
    return inter / union if union > 0 else 0.0


def _boundary_dist(v: float) -> float:
    """Distance of a raw value from its print-rounding boundary (the .5
    fractional line, where both C round() and printf %.0f flip)."""
    import math
    f = abs(v) - math.floor(abs(v))
    return abs(f - 0.5)


def _confirm_f64(names, cfg, wpath, img, thresh, quantized, oracle_lines):
    """Two-sided acceptance for a ULP-classified detect diff: rerun the SAME
    repo logic at float64 (tests/fuzz_confirm.py) and require
    (a) the f64 output sits in the same noise class vs the oracle, and
    (b) every still-disputed printed field is boundary-adjacent at f64 —
        the true value is within float-noise distance of the rounding
        boundary, which is WHY two correct f32 implementations flip it.
    A logic bug reproduces at f64 with fields uniformly far from boundaries
    and fails (b). Returns (ok, message)."""
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    r = subprocess.run(
        [sys.executable, os.path.join(here, "fuzz_confirm.py"),
         names, cfg, wpath, img, str(thresh)]
        + (["-quantized"] if quantized else []),
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_ENABLE_X64": "1", "PYTHONPATH": "/root/repo"})
    if r.returncode != 0:
        return False, f"f64 rerun rc={r.returncode}: {r.stderr[-200:]!r}"
    lines64, raws = [], {}
    qbound = float("inf")   # min rel distance of any int8 conv input to its
    #                         trunc bin boundary (quantized mode; f64)
    pending = None
    from util_parity import parse_detection_lines
    for line in r.stdout.splitlines():
        if line.startswith("#QBOUND "):
            qbound = float(line[8:])
            continue
        if line.startswith("#RAW "):
            vals = [float(x) for x in line[5:].split()]
            if pending is not None and len(vals) == 5:
                raws.setdefault(pending, []).append(vals)
            pending = None
        else:
            lines64.append(line)
            det, _ = parse_detection_lines(line)
            pending = det[0] if det else None
    residue = []
    if not _ulp_class_only(oracle_lines, lines64, residue_out=residue):
        return False, "f64 rerun NOT in the noise class vs the oracle"
    n_binflip = 0
    for d, e, kind in residue:
        if kind != "near":
            continue  # tie pairs: either survivor valid; adjacency undefined
        raw_list = raws.get(e)
        if not raw_list:
            return False, f"no raw values for f64 residue det {e}"
        raw = raw_list[0]
        for fi in range(1, 6):
            if d[fi] == e[fi]:
                continue
            v = raw[fi - 1]
            tol = max(0.02, 1e-4 * abs(v))
            if _boundary_dist(v) > tol:
                if quantized and qbound <= 1e-6:
                    # quantization-bin flip (mechanism evidence from the
                    # f64 run, fuzz_confirm._min_quant_boundary_rel): some
                    # int8 conv input sits at f32-ULP distance from its
                    # trunc bin boundary, so the two implementations run
                    # DIFFERENT integer networks — the print delta is the
                    # propagated bin, not lowering noise of the print
                    # itself. The classifier's near-pair bound (+-1 per
                    # field) and 5% print-precision cap still apply.
                    n_binflip += 1
                    continue
                return False, (f"disputed field {fi} of {e}: raw f64 {v!r} "
                               f"is {_boundary_dist(v):.4f} from its print "
                               f"boundary (tol {tol:.4f}) — not lowering "
                               "noise")
    nms_thr = 0.2 if quantized else 0.4   # detect-app defaults (CLI parity)
    for d, e, kind in residue:
        if kind != "suppression" or e != "ours":
            # oracle-side singletons: the f64 run suppressed the det, so its
            # raw box never prints — only the class-level gate (above) and
            # the print-side suppressor requirement apply
            continue
        rl = raws.get(d)
        if not rl:
            return False, f"no raw values for f64 suppression singleton {d}"
        sp, sbox = rl[0][0], rl[0][1:5]
        ok_s = False
        for det2, rl2 in raws.items():
            if det2 == d or det2[0] != d[0]:
                continue
            for r2 in rl2:
                if r2[0] < sp - 1e-6:
                    continue              # a suppressor has >= prob
                if abs(_iou_ltwh(sbox, r2[1:5]) - nms_thr) <= 0.02:
                    ok_s = True           # the IoU sits AT the threshold —
                    break                 # a knife-edge flip, not a bug
            if ok_s:
                break
        if not ok_s:
            return False, (f"suppression singleton {d}: no same-class "
                           f">=prob det with raw f64 IoU within 0.02 of "
                           f"the nms threshold {nms_thr} — an extra "
                           "survivor this far from the boundary is a bug")
    n_near = sum(1 for *_, k in residue if k == "near")
    n_sup = sum(1 for *_, k in residue if k == "suppression")
    extra = (f", {n_binflip} via quantization-bin flip (qbound {qbound:.1e})"
             if n_binflip else "")
    return True, (f"f64-confirmed: {len(residue)} residue pairs "
                  f"({n_near} boundary-adjacent, {n_sup} suppression-flip, "
                  f"{len(residue) - n_near - n_sup} tie-class){extra}")


def _map_noise_only(oracle_lines, ours_lines, float_lim=0.02):
    """True iff a map-output diff is explained by the documented aggregate
    noise class (fuzz docstring above): identical line skeletons where ints
    differ by <= max(1, 1e-4 x magnitude) and floats by <=0.02 (a %2.2f
    print-boundary flip of an aggregate summed over thousands of
    sub-ULP-noisy records).

    The int bound scales with magnitude because the flip count does: on a
    tie-degenerate 52k-detection net every record matched the oracle's
    within ~1e-6 relative (XLA-vs-libm sigmoid ULPs, verified record-by-
    record with a hex-float C harness against the oracle objects), yet 2 of
    52207 IoU/sort comparisons landed on the other side of their boundary —
    ~4e-5 of the count. 1e-4 covers that with headroom while still failing
    on any real accounting bug (off-by-one-image is >1e-2 of the count)."""
    if len(oracle_lines) != len(ours_lines):
        return False
    num = re.compile(r"-?\d+(?:\.\d+)?")
    for la, lb in zip(oracle_lines, ours_lines):
        if la == lb:
            continue
        if num.sub("#", la) != num.sub("#", lb):
            return False
        for va, vb in zip(num.findall(la), num.findall(lb)):
            if va == vb:
                continue
            is_int = va.lstrip("-").isdigit() and vb.lstrip("-").isdigit()
            lim = (max(1.0, 1e-4 * max(abs(float(va)), abs(float(vb))))
                   if is_int else float_lim)
            if abs(float(va) - float(vb)) > lim:
                return False
    return True


def main(n_nets=20, seed0=0):
    names = os.path.join(OUT, "f.names")
    with open(names, "w") as f:
        f.write("aaa\nbbb\nccc\n")
    fails = 0
    confirm_cache = {}   # (net, quantized) -> _confirm_f64 result
    for t in range(n_nets):
        rng = np.random.RandomState(seed0 + t)
        cfg_text = gen_cfg(rng)
        cfg = os.path.join(OUT, f"net{t}.cfg")
        with open(cfg, "w") as f:
            f.write(cfg_text)
        try:
            spec = parse_network_cfg(cfg, batch=1)
        except Exception as e:
            print(f"[{t}] OUR PARSER REJECTED: {e}")
            fails += 1
            continue
        wpath = os.path.join(OUT, f"w{t}.weights")
        save_weights(spec, random_params(spec, seed=t), wpath)
        img = os.path.join(OUT, f"i{t}.png")
        ih, iw = int(rng.randint(17, 230)), int(rng.randint(17, 230))
        Image.fromarray((rng.rand(ih, iw, 3) * 255).astype(np.uint8)).save(img)
        # variants: (quantized, pp_stages, pp_tp). pp=2 stresses the pipeline
        # stage-splitter's carried-tensor liveness over the random
        # route/shortcut topology (fp32 pp is bit-identical to single-device
        # at equal microbatch, so the strict stream diff applies unchanged);
        # every 6th net composes pp with tp=2-sharded stages (4 virtual
        # devices, GSPMD channel sharding inside each stage), alternating
        # fp32 / -quantized (advisor r3: int8 stage params under per-stage
        # GSPMD were CLI-reachable but never fuzzed).
        variants = [(False, 0, 1, None)]
        if t % 2 == 0:
            variants.append((True, 0, 1, None))
        if t % 3 == 0:
            variants.append((t % 12 == 6, 2,
                             2 if t % 6 == 0 else 1, None))
        # xnor nets: every other one also runs -xnor_kernel auto (per-layer
        # engine pick on GEMM M — small-M layers take the bit-packed Pallas
        # MXU path; all engines are bit-identical so the SAME strict oracle
        # diff applies; random 17-230px inputs put random layers on each
        # side of the AUTO_MXU_MAX_PIXELS crossover)
        if "xnor=1" in cfg_text and t % 2 == 1:
            variants.append((False, 0, 1, "auto"))
        for quant, pp, tp, xnor_eng in variants:
            args = ["detector", "test", names, cfg, wpath, img,
                    "-thresh", "0.3", "-dont_show"] + (
                        ["-quantized"] if quant else [])
            ro = subprocess.run([ORACLE] + args, capture_output=True,
                                text=True, timeout=300, cwd=OUT)
            env = {**os.environ, "YOLO2_TPU_PLATFORM": "cpu",
                   "PYTHONPATH": "/root/repo"}
            our_args = list(args)
            if xnor_eng:
                our_args += ["-xnor_kernel", xnor_eng]
            if pp:
                our_args += ["-pp", str(pp)]
                if tp > 1:
                    our_args += ["-pp_tp", str(tp)]
                env["XLA_FLAGS"] = (
                    env.get("XLA_FLAGS", "") +
                    f" --xla_force_host_platform_device_count={pp * tp}")
            ru = subprocess.run([sys.executable, "-m", "yolo2_light_tpu"]
                                + our_args, capture_output=True, text=True,
                                timeout=300, cwd=OUT, env=env)
            tag = (f"net{t} q{int(quant)}" + (f" pp{pp}" if pp else "")
                   + (f" tp{tp}" if tp > 1 else "")
                   + (f" xnor-{xnor_eng}" if xnor_eng else ""))
            if ro.returncode != 0:
                print(f"[{tag}] oracle rc={ro.returncode}: "
                      f"{ro.stderr[-120:]!r} (skipping)")
                continue
            if ru.returncode != 0:
                print(f"[{tag}] OURS rc={ru.returncode}: {ru.stderr[-200:]!r}")
                fails += 1
                continue
            # environment log noise (glog/absl, both streams) and ours-only
            # diagnostics (OUR stream only — a reference-side 'note:' line
            # would still diff): shared filter, unit-tested in
            # tests/test_stream_filters.py
            from util_parity import clean_stream
            eo = clean_stream(ro.stderr)
            eu = clean_stream(ru.stderr, ours=True)
            if eu != eo:
                import difflib
                d = list(difflib.unified_diff(eo, eu,
                                              "oracle", "ours", lineterm=""))
                print(f"[{tag}] STDERR DIFF:\n" + "\n".join(d[:12]))
                fails += 1
            strip = lambda s: [l for l in s.splitlines()
                               if "Predicted in" not in l]
            if strip(ru.stdout) != strip(ro.stdout):
                if _ulp_class_only(strip(ro.stdout), strip(ru.stdout)):
                    # two-sided acceptance: the f64 confirming rerun must
                    # also land in the noise class AND show every disputed
                    # field boundary-adjacent (one rerun per net+mode; the
                    # pp/xnor variants share the same base program)
                    ckey = (t, quant)
                    if ckey not in confirm_cache:
                        confirm_cache[ckey] = _confirm_f64(
                            names, cfg, wpath, img, 0.3, quant,
                            strip(ro.stdout))
                    ok64, msg64 = confirm_cache[ckey]
                    if ok64:
                        print(f"[{tag}] ULP-class diff (expected: "
                              f"print-boundary rounding / near-equal "
                              f"reordering) — {msg64}")
                        continue
                    print(f"[{tag}] ULP-class diff REJECTED by the f64 "
                          f"confirming rerun: {msg64}")
                    fails += 1
                    continue
                import difflib
                d = list(difflib.unified_diff(strip(ro.stdout),
                                              strip(ru.stdout),
                                              "oracle", "ours", lineterm=""))
                print(f"[{tag}] STDOUT DIFF ({len(d)} lines):\n"
                      + "\n".join(d[:12]))
                fails += 1

        # every 5th net: detector map over a tiny random dataset — fuzzes the
        # mAP accounting (matching, difficult-free PR accumulation, avg_iou,
        # rank markers, -nan F1) over the random topology
        if t % 5 == 0:
            ds = os.path.join(OUT, f"mapds{t}")
            os.makedirs(os.path.join(ds, "images"), exist_ok=True)
            os.makedirs(os.path.join(ds, "labels"), exist_ok=True)
            mpaths = []
            # >= nthreads=4 images: the reference's 4-thread loader reads
            # beyond a shorter valid list (additionally.c:4584-4628 indexes
            # i+t without an m bound at setup) and segfaults
            for i in range(int(rng.randint(4, 7))):
                mh, mw = int(rng.randint(24, 120)), int(rng.randint(24, 120))
                mp = os.path.join(ds, "images", f"im{i}.png")
                Image.fromarray((rng.rand(mh, mw, 3) * 255)
                                .astype(np.uint8)).save(mp)
                mpaths.append(mp)
                with open(os.path.join(ds, "labels", f"im{i}.txt"), "w") as f:
                    for _ in range(rng.randint(1, 4)):
                        cid = rng.randint(0, 3)
                        bx, by = rng.uniform(0.2, 0.8, 2)
                        bw, bh = rng.uniform(0.1, 0.4, 2)
                        f.write(f"{cid} {bx:.6f} {by:.6f} {bw:.6f} {bh:.6f}\n")
            vlist = os.path.join(ds, "valid.txt")
            with open(vlist, "w") as f:
                f.write("\n".join(mpaths) + "\n")
            dfile = os.path.join(ds, "mini.data")
            with open(dfile, "w") as f:
                f.write(f"classes=3\nvalid={vlist}\nnames={names}\n")
            margs = ["detector", "map", dfile, cfg, wpath, "-thresh", "0.24"]
            ro = subprocess.run([ORACLE] + margs, capture_output=True,
                                text=True, timeout=600, cwd=OUT)
            # every other map net runs OUR side with -device_nms (on-device
            # greedy NMS, ours-only extension, identical detections) against
            # the oracle's HOST-NMS output; a net dense enough to saturate
            # device NMS's bounded K=4096 cap (O(K^2) IoU — pipeline._max_k)
            # legitimately drops candidates and is skipped with a note
            m_devnms = (t % 10 == 5)
            ru = subprocess.run([sys.executable, "-m", "yolo2_light_tpu"]
                                + margs
                                + (["-device_nms"] if m_devnms else []),
                                capture_output=True, text=True,
                                timeout=600, cwd=OUT,
                                env={**os.environ,
                                     "YOLO2_TPU_PLATFORM": "cpu",
                                     "PYTHONPATH": "/root/repo"})
            tag = f"net{t} map" + (" devnms" if m_devnms else "")
            # returncode gates come FIRST: a crashed run that happened to
            # print the saturation warning earlier must count as a failure,
            # not a documented skip (round-4 advisor finding)
            if (m_devnms and ru.returncode == 0
                    and "may be dropped" in ru.stderr):
                print(f"[{tag}] device-NMS K cap saturated on this net "
                      "(documented bound; skipping strict diff)")
            elif ro.returncode != 0:
                print(f"[{tag}] oracle rc={ro.returncode}: "
                      f"{ro.stderr[-120:]!r} (skipping)")
            elif ru.returncode != 0:
                print(f"[{tag}] OURS rc={ru.returncode}: {ru.stderr[-200:]!r}")
                fails += 1
            else:
                from util_parity import clean_stream
                eo = clean_stream(ro.stderr, drop=("Total Detection Time",))
                eu = clean_stream(ru.stderr, ours=True,
                                  drop=("Total Detection Time",))
                if eu != eo:
                    import difflib
                    d = list(difflib.unified_diff(eo, eu,
                                                  "oracle", "ours",
                                                  lineterm=""))
                    print(f"[{tag}] STDERR DIFF:\n" + "\n".join(d[:12]))
                    fails += 1
                if ru.stdout != ro.stdout:
                    ol, ul = ro.stdout.splitlines(), ru.stdout.splitlines()
                    # round 5: device NMS is tie-order EXACT (it computes the
                    # carried-qsort permutation on chip — post/device_nms.py,
                    # test_device_nms_tie_order_matches_host_qsort_carry), so
                    # the devnms variant holds the SAME noise bound as the
                    # host path; the round-4 blanket 0.05 tie tolerance is
                    # retired
                    if _map_noise_only(ol, ul):
                        # two-sided: the f64 map rerun (f64 convs + f64
                        # packed/host chain) must sit in the SAME aggregate
                        # noise class vs the oracle — a small accounting bug
                        # reproduces at f64 and fails here
                        r64 = subprocess.run(
                            [sys.executable,
                             os.path.join(os.path.dirname(
                                 os.path.abspath(__file__)),
                                 "fuzz_confirm.py"),
                             "--map", dfile, cfg, wpath, "0.24"],
                            capture_output=True, text=True, timeout=900,
                            cwd=OUT, env={**os.environ,
                                          "JAX_ENABLE_X64": "1",
                                          "PYTHONPATH": "/root/repo"})
                        ok64 = (r64.returncode == 0 and _map_noise_only(
                            ol, r64.stdout.splitlines()))
                        if ok64:
                            print(f"[{tag}] aggregate-noise-class diff "
                                  "(expected; f64-confirmed)")
                        else:
                            print(f"[{tag}] aggregate diff REJECTED by the "
                                  f"f64 map rerun (rc={r64.returncode})")
                            fails += 1
                    else:
                        import difflib
                        d = list(difflib.unified_diff(ol, ul, "oracle",
                                                      "ours", lineterm=""))
                        print(f"[{tag}] MAP STDOUT DIFF ({len(d)} lines):\n"
                              + "\n".join(d[:16]))
                        fails += 1
        # every 7th net: the calibrate app (entropy/KL calibration) over the
        # random topology — strict stream diffs + input_calibration.txt
        # BYTE compare (host method is the bit-exact path; fixed-fixture
        # byte parity lives in test_calibrate_parity.py)
        if t % 7 == 3:
            # dedicated restricted net (see gen_cfg calib_mode): the
            # oracle's calibration forward only executes
            # conv/maxpool/route/reorg/region
            crng = np.random.RandomState(50000 + seed0 + t)
            ccfg_text = gen_cfg(crng, calib_mode=True)
            ccfg = os.path.join(OUT, f"calnet{t}.cfg")
            with open(ccfg, "w") as f:
                f.write(ccfg_text)
            try:
                cspec = parse_network_cfg(ccfg, batch=1)
            except Exception as e:
                print(f"[net{t} calibrate] OUR PARSER REJECTED: {e}")
                fails += 1
                continue
            cwpath = os.path.join(OUT, f"calw{t}.weights")
            save_weights(cspec, random_params(cspec, seed=1000 + t), cwpath)
            cds = os.path.join(OUT, f"calds{t}")
            os.makedirs(cds, exist_ok=True)
            cpaths = []
            # >= nthreads=4 images: same unbounded 4-thread loader setup as
            # map (additionally.c:4972 indexes paths[i+t] with no m bound)
            for i in range(int(rng.randint(4, 7))):
                ch, cw = int(rng.randint(24, 100)), int(rng.randint(24, 100))
                cp = os.path.join(cds, f"c{i}.png")
                Image.fromarray((rng.rand(ch, cw, 3) * 255)
                                .astype(np.uint8)).save(cp)
                cpaths.append(cp)
            cvalid = os.path.join(cds, "valid.txt")
            with open(cvalid, "w") as f:
                f.write("\n".join(cpaths) + "\n")
            cdata = os.path.join(cds, "c.data")
            with open(cdata, "w") as f:
                f.write(f"classes=3\nvalid={cvalid}\nnames={names}\n")
            cargs = ["detector", "calibrate", cdata, ccfg, cwpath,
                     "-input_calibration", "2"]
            odir = os.path.join(cds, "oracle")   # both write
            udir = os.path.join(cds, "ours")     # input_calibration.txt to cwd
            os.makedirs(odir, exist_ok=True)
            os.makedirs(udir, exist_ok=True)
            ro = subprocess.run([ORACLE] + cargs, capture_output=True,
                                text=True, timeout=300, cwd=odir)
            ru = subprocess.run([sys.executable, "-m", "yolo2_light_tpu"]
                                + cargs + ["-calib_method", "host"],
                                capture_output=True, text=True, timeout=300,
                                cwd=udir,
                                env={**os.environ,
                                     "YOLO2_TPU_PLATFORM": "cpu",
                                     "PYTHONPATH": "/root/repo"})
            tag = f"net{t} calibrate"
            if ro.returncode != 0:
                print(f"[{tag}] oracle rc={ro.returncode}: "
                      f"{ro.stderr[-120:]!r} (skipping)")
            elif ru.returncode != 0:
                print(f"[{tag}] OURS rc={ru.returncode}: "
                      f"{ru.stderr[-200:]!r}")
                fails += 1
            else:
                from util_parity import clean_stream
                if (clean_stream(ru.stderr, ours=True)
                        != clean_stream(ro.stderr)):
                    import difflib
                    d = list(difflib.unified_diff(
                        clean_stream(ro.stderr),
                        clean_stream(ru.stderr, ours=True),
                        "oracle", "ours", lineterm=""))
                    print(f"[{tag}] STDERR DIFF:\n" + "\n".join(d[:12]))
                    fails += 1
                strip_t = lambda s: [l for l in s.splitlines()
                                     if "Predicted in" not in l]
                if strip_t(ru.stdout) != strip_t(ro.stdout):
                    import difflib
                    d = list(difflib.unified_diff(strip_t(ro.stdout),
                                                  strip_t(ru.stdout),
                                                  "oracle", "ours",
                                                  lineterm=""))
                    print(f"[{tag}] CALIB STDOUT DIFF ({len(d)} lines):\n"
                          + "\n".join(d[:12]))
                    fails += 1
                fo = os.path.join(odir, "input_calibration.txt")
                fu = os.path.join(udir, "input_calibration.txt")
                co = open(fo, "rb").read() if os.path.exists(fo) else None
                cu = open(fu, "rb").read() if os.path.exists(fu) else None
                if co != cu:
                    print(f"[{tag}] CALIB FILE DIFF:\noracle: {co!r:.200}\n"
                          f"ours:   {cu!r:.200}")
                    fails += 1

    print(f"done: {n_nets} nets, {fails} failures")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20,
         int(sys.argv[2]) if len(sys.argv) > 2 else 0)
