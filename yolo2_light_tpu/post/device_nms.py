"""On-device exact greedy NMS (XLA, runs fused with decode/compaction).

TPU-native counterpart of ``do_nms_sort`` (src/box.c:296-328): per class, walk
candidates in descending-prob order; a surviving box zeroes the class-prob of any
later box with IoU > thresh. With this fused into the serving program, the packed
candidate buffer that leaves the chip is already suppressed — the host only drops
zero rows, corrects coordinates and formats.

Semantics notes (each matches the host oracle in post/boxes.py):

* The sequential-greedy recurrence is kept exactly: a *suppressed* box never
  suppresses others. The loop runs over sorted positions (one ``fori_loop`` step
  per rank, all classes in parallel) — O(K) steps of [C, K] vector work after one
  [K, K] IoU matrix, instead of the reference's per-class scalar loops.
* Sorting is stable descending (``jnp.argsort`` is stable), so equal-prob ties
  resolve to candidate-buffer order — the same rule as the host path applied to
  the same compacted buffer.
* NMS here runs BEFORE `correct_boxes` (the reference corrects first,
  src/additionally.c:4403-4407). The letterbox correction is a per-axis affine
  scale, under which axis-aligned intersection and union areas scale by the same
  sx*sy factor — IoU is invariant, so the suppressed set is identical (modulo
  float rounding at exact ``iou == thresh`` boundaries).
* Zero-objectness exclusion (the reference's swap-to-end prefilter) needs no
  special handling: a candidate with zero objectness has all-zero probs (probs
  are objectness-scaled at decode), so it neither suppresses nor changes when
  "suppressed".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_iou(boxes):
    """[K,4] center-format (x,y,w,h) -> [K,K] IoU
    (reference math: box_iou/box_intersection/overlap, src/box.c:70-97:
    negative overlap => intersection 0; union <= 0 => IoU 0; no epsilon)."""
    x, y, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    x1, x2 = x - w / 2, x + w / 2
    y1, y2 = y - h / 2, y + h / 2
    iw = jnp.minimum(x2[:, None], x2[None, :]) - jnp.maximum(x1[:, None],
                                                             x1[None, :])
    ih = jnp.minimum(y2[:, None], y2[None, :]) - jnp.maximum(y1[:, None],
                                                             y1[None, :])
    inter = jnp.where((iw < 0) | (ih < 0), 0.0, iw * ih)
    union = (w * h)[:, None] + (w * h)[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_probs(boxes, probs, thresh: float):
    """Greedy per-class NMS over one image's candidates.

    ``boxes``: [K,4]; ``probs``: [K,C]. Returns probs with suppressed entries
    zeroed (identical to do_nms_sort run on the same candidate order).
    """
    k, c = probs.shape
    iou = pairwise_iou(boxes)
    # order[cls, t] = candidate index at sorted position t (descending prob,
    # stable); rank = inverse permutation: rank[cls, j] = sorted position of j
    sorted_desc = -jnp.sort(-probs, axis=0)      # [K,C] per-class descending
    order = jnp.argsort(-probs, axis=0).T
    rank = jnp.argsort(order, axis=1)
    class_ix = jnp.arange(c)
    over = iou > thresh
    # ranks past the last nonzero prob (in EVERY class) are padding/sub-threshold
    # slots: nothing to keep or suppress there, so the walk stops early.
    # Serving thresholds (0.24+) leave tens of live ranks in a K=256 buffer;
    # the dense-eval regime (map's thresh=0.005, K=1024) runs the full K steps
    # — still measured 2.6-4x faster than the native host NMS there (and under
    # vmap the batch runs until its LAST image is done). Memory note: the
    # [K, K] IoU matrix is per-image; at K=4096 (auto-grow cap) keep the batch
    # small.
    rank_has_work = jnp.max(sorted_desc, axis=1)  # [K], non-increasing

    def cond(state):
        t, _ = state
        return (t < k) & (rank_has_work[t] > 0)

    def body(state):
        t, probs_work = state
        cur = order[:, t]                        # [C] current candidate per class
        active = probs_work[cur, class_ix] != 0  # survived all earlier ranks?
        # suppress only LATER sorted positions (rank > t): earlier ones already
        # made their keep decision; the current one must not suppress itself
        suppress = active[:, None] & over[cur] & (rank > t)
        return t + 1, jnp.where(suppress.T, jnp.zeros((), probs_work.dtype),
                                probs_work)

    return jax.lax.while_loop(cond, body, (jnp.int32(0), probs))[1]


def nms_packed(packed, thresh: float):
    """Apply :func:`nms_probs` to a packed [B, K, 4+1+classes] candidate buffer
    (columns: box(4), objectness, probs...). Returns the buffer with suppressed
    probs zeroed; boxes/objectness pass through untouched."""
    new_probs = jax.vmap(lambda b, p: nms_probs(b, p, thresh))(
        packed[..., :4], packed[..., 5:])
    return jnp.concatenate([packed[..., :5], new_probs], axis=-1)
