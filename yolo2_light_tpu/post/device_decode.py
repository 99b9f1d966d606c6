"""On-device detection decode + candidate compaction (XLA, runs fused with the net).

The reference decodes boxes on the host from full feature maps
(get_network_boxes, src/additionally.c:4403). On TPU the full head maps are the
wrong thing to move off-chip (tens of MB/image); instead we decode boxes and
class-probs on device, zero probs at the threshold exactly like the reference, and
compact to the top-K candidates by best class prob. Only [K, 4+1+classes] floats per
image leave the chip. Exact greedy NMS then runs on the host over K boxes
(identical semantics to do_nms_sort, src/box.c:296) — box values are bit-identical
to the host decode path because the math is the same formula.

K must be >= the number of boxes with any prob > thresh for exactness (boxes with
all-zero probs can neither print nor suppress — see do_nms_sort's
``if prob[k]==0 continue``); a ``valid_count`` output lets callers detect overflow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import RegionSpec, YoloSpec


def _decode_yolo(h, spec: YoloSpec, netw: int, neth: int, thresh: float):
    """[B,H,W,n,5+classes] -> boxes [B,N,4], obj [B,N], probs [B,N,C]
    (reference math: get_yolo_box, src/additionally.c:4317-4325)."""
    b, lh, lw, n, _ = h.shape
    cols = jnp.arange(lw, dtype=jnp.float32)[None, None, :, None]
    rows = jnp.arange(lh, dtype=jnp.float32)[None, :, None, None]
    mask = np.asarray(spec.mask)
    anchors = np.asarray(spec.anchors, np.float32)
    aw = jnp.asarray(anchors[2 * mask])[None, None, None, :]
    ah = jnp.asarray(anchors[2 * mask + 1])[None, None, None, :]
    bx = (cols + h[..., 0]) / lw
    by = (rows + h[..., 1]) / lh
    bw = jnp.exp(h[..., 2]) * aw / netw
    bh = jnp.exp(h[..., 3]) * ah / neth
    obj = h[..., 4]
    # detection exists only when obj > thresh (reference: src/additionally.c:4340)
    exists = obj > thresh
    probs = h[..., 5:] * obj[..., None]
    probs = jnp.where(probs > thresh, probs, 0.0) * exists[..., None]
    boxes = jnp.stack([bx, by, bw, bh], axis=-1)
    N = lh * lw * n
    return (boxes.reshape(b, N, 4), obj.reshape(b, N),
            probs.reshape(b, N, -1))


def _decode_region(h, spec: RegionSpec, netw: int, neth: int, thresh: float):
    """[B,H,W,n,coords+1+classes] -> same triple (reference math:
    get_region_box_cpu/get_region_boxes_cpu, src/yolov2_forward_network.c:653-726)."""
    b, lh, lw, n, _ = h.shape
    coords = spec.coords
    cols = jnp.arange(lw, dtype=jnp.float32)[None, None, :, None]
    rows = jnp.arange(lh, dtype=jnp.float32)[None, :, None, None]
    anchors = np.asarray(spec.anchors, np.float32)
    aw = jnp.asarray(anchors[0::2][:n])[None, None, None, :]
    ah = jnp.asarray(anchors[1::2][:n])[None, None, None, :]
    sig = jax.nn.sigmoid
    bx = (cols + sig(h[..., 0])) / lw
    by = (rows + sig(h[..., 1])) / lh
    bw = jnp.exp(h[..., 2]) * aw / lw
    bh = jnp.exp(h[..., 3]) * ah / lh
    scale = h[..., coords]
    if spec.classfix == -1:
        scale = jnp.where(scale < 0.5, 0.0, scale)
    if spec.softmax_tree is not None:
        # YOLO9000 hierarchy on device: cascade parent products level by level
        # (parents always precede children), then keep only the deepest node with
        # path-prob > 0.5 per box; prob_j = (scale > thresh) ? pred_j : 0
        # (reference: src/additionally.c:1878 + src/yolov2_forward_network.c:694)
        tree = spec.softmax_tree
        preds = h[..., coords + 1:]
        parent = np.asarray(tree.parent)
        depth = np.zeros(tree.n, np.int64)
        for j in range(tree.n):
            if parent[j] >= 0:
                depth[j] = depth[parent[j]] + 1
        for d in range(1, int(depth.max()) + 1 if tree.n else 1):
            idx = np.nonzero(depth == d)[0]
            if idx.size == 0:
                continue
            preds = preds.at[..., idx].multiply(preds[..., parent[idx]])
        if spec.class_map is not None:
            # map-file decode (reference: src/yolov2_forward_network.c:694-698):
            # prob_j = scale * preds[map[j]], zeroed at <= thresh; columns past
            # the map stay zero
            cm = np.asarray(spec.class_map)
            sel = preds[..., cm] * scale[..., None]
            sel = jnp.where(sel > thresh, sel, 0.0)
            probs = jnp.zeros(preds.shape[:-1] + (spec.classes,), preds.dtype)
            probs = probs.at[..., : cm.size].set(sel)
        else:
            over = preds > 0.5
            classes_n = preds.shape[-1]
            rev_first = jnp.argmax(over[..., ::-1], axis=-1)
            keep_idx = jnp.where(over.any(-1), classes_n - 1 - rev_first, -1)
            onehot = (jnp.arange(classes_n)[None, None, None, None, :]
                      == keep_idx[..., None])
            probs = jnp.where(onehot, preds, 0.0)
            probs = jnp.where((scale > thresh)[..., None], probs, 0.0)
    else:
        probs = h[..., coords + 1:] * scale[..., None]
        probs = jnp.where(probs > thresh, probs, 0.0)
    boxes = jnp.stack([bx, by, bw, bh], axis=-1)
    N = lh * lw * n
    return (boxes.reshape(b, N, 4), jnp.ones((b, N), jnp.float32),
            probs.reshape(b, N, -1))


def decode_and_compact(heads, head_specs, netw: int, neth: int, thresh: float,
                       k: int = 256, decode_order: bool = False):
    """Decode all heads, zero sub-threshold probs, select top-k candidates by best
    class prob. Returns (boxes [B,k,4], objectness [B,k], probs [B,k,C],
    valid_count [B]).

    ``decode_order=True`` re-sorts the selected k rows by their DECODE index
    (heads in network order, cells row-major, anchors inner) instead of
    leaving them in top-k score order. The selected SET is identical; the
    order matters for exact-prob ties downstream: the reference's host NMS
    tie-breaks on the decode-order array (box.c:296-328 + stable glibc
    qsort), so the host-NMS path wants rows in that order. Costs one [B,k]
    argsort on device, no extra transfer."""
    parts = []
    for h, spec in zip(heads, head_specs):
        if isinstance(spec, YoloSpec):
            parts.append(_decode_yolo(h, spec, netw, neth, thresh))
        elif isinstance(spec, RegionSpec):
            parts.append(_decode_region(h, spec, netw, neth, thresh))
        else:
            raise TypeError(type(spec))
    boxes = jnp.concatenate([p[0] for p in parts], axis=1)
    obj = jnp.concatenate([p[1] for p in parts], axis=1)
    probs = jnp.concatenate([p[2] for p in parts], axis=1)
    score = jnp.max(probs, axis=-1)                      # [B,N]
    valid_count = jnp.sum((score > 0).astype(jnp.int32), axis=-1)
    k = min(k, score.shape[1])
    top_score, idx = jax.lax.top_k(score, k)             # [B,k]
    if decode_order:
        idx = jnp.sort(idx, axis=-1)                     # unique -> stable
    gather = jax.vmap(lambda a, i: a[i])
    return (gather(boxes, idx), gather(obj, idx), gather(probs, idx),
            valid_count)


def decode_and_compact_packed(heads, head_specs, netw: int, neth: int,
                              thresh: float, k: int = 256,
                              decode_order: bool = False):
    """Like decode_and_compact but returns ONE packed buffer
    [B, k, 4+1+classes] = (box, objectness, probs...) — a single small D2H transfer
    (relay/PCIe round trips are per-buffer). K-overflow is detectable on the host:
    all k slots having a nonzero prob means candidates may have been dropped."""
    boxes, obj, probs, _ = decode_and_compact(heads, head_specs, netw, neth,
                                              thresh, k,
                                              decode_order=decode_order)
    return jnp.concatenate([boxes, obj[..., None], probs], axis=-1)


def compact_to_detections(boxes, obj, probs, valid_count, w: int, h: int,
                          netw: int, neth: int, relative: bool = True,
                          letter: bool = False):
    """Host side: one image's compacted candidates -> Detections (drops all-zero-prob
    slots, applies correct_yolo_boxes)."""
    from .boxes import Detections, correct_boxes
    boxes = np.asarray(boxes)
    obj = np.asarray(obj)
    probs = np.asarray(probs)
    keep = probs.max(axis=-1) > 0
    boxes, obj, probs = boxes[keep], obj[keep], probs[keep]
    boxes = correct_boxes(boxes.astype(np.float32), w, h, netw, neth,
                          relative, letter)
    return Detections(boxes.astype(np.float32), obj.astype(np.float32),
                      probs.astype(np.float32))
