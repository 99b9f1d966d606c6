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
* Tie order is qsort-CARRY exact (round-5: the last residual parity class):
  the reference re-sorts the SAME array class after class (box.c:310-317), so
  class c's stable sort tie-breaks on the permutation classes 0..c-1 left
  behind. Crucially every sort key is an ORIGINAL prob — class c's walk
  zeroes only column c, after its own sort, and no later class re-sorts on
  column c — so the whole permutation chain is computable UPFRONT (one
  ``lax.scan`` of stable argsorts) and the per-class walks stay parallel.
  Given rows in the reference's pre-NMS array order
  (``decode_and_compact(decode_order=True)``), the surviving set AND the
  post-NMS array order (``perm`` below) match the host path on exact-prob
  ties, not just on tie-free workloads.
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


def nms_probs_with_order(boxes, probs, thresh: float):
    """Greedy per-class NMS over one image's candidates.

    ``boxes``: [K,4]; ``probs``: [K,C]. Returns ``(probs, perm)``: probs with
    suppressed entries zeroed, in the ORIGINAL row order (do_nms_sort's
    in-place semantics), and ``perm`` = the reference's post-NMS array order
    (original row indices after the last class's qsort — what
    ``Detections.nms_order`` is on the host path).
    """
    k, c = probs.shape
    iou = pairwise_iou(boxes)
    # order[cls, t] = candidate index at sorted position t. The carried-qsort
    # chain (module docstring): class c's order = stable descending sort of
    # the order class c-1 left behind. All keys are original probs, so one
    # scan over class columns yields every walk order and the final perm.
    sorted_desc = -jnp.sort(-probs, axis=0)      # [K,C] per-class descending

    def sort_step(perm, p_col):
        new = perm[jnp.argsort(-p_col[perm], stable=True)]
        return new, new

    perm, order = jax.lax.scan(sort_step, jnp.arange(k, dtype=jnp.int32),
                               probs.T)
    rank = jnp.argsort(order, axis=1)  # rank[cls, j] = sorted position of j
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

    out = jax.lax.while_loop(cond, body, (jnp.int32(0), probs))[1]
    return out, perm


def nms_probs(boxes, probs, thresh: float):
    """:func:`nms_probs_with_order` without the permutation (suppressed probs
    only, original row order)."""
    return nms_probs_with_order(boxes, probs, thresh)[0]


def nms_packed(packed, thresh: float, reorder: bool = True):
    """Apply the NMS to a packed [B, K, 4+1+classes] candidate buffer
    (columns: box(4), objectness, probs...). Returns the buffer with
    suppressed probs zeroed. With ``reorder`` (default) rows additionally
    leave in the reference's POST-NMS array order (the host path's
    ``nms_order``), so downstream print/draw/map-insertion loops iterate the
    buffer exactly like the reference iterates its qsort-permuted array —
    given the buffer was built with ``decode_order=True``."""
    def one(rows, b, p):
        new_probs, perm = nms_probs_with_order(b, p, thresh)
        out = jnp.concatenate([rows[..., :5], new_probs], axis=-1)
        return out[perm] if reorder else out

    return jax.vmap(one)(packed, packed[..., :4], packed[..., 5:])
