"""XNOR (BIT1) weight binarization transform.

Reference: binarize_weights (src/additionally.c:113-126) represents binary weights as
+-mean(|w|) per filter; get_mean_array (src/additionally.c:188-194) extracts the scalar.
We factor the per-filter mean out of the matmul: weights become sign(+-1) int8 and the
mean is applied in the conv epilogue — mathematically identical, MXU-friendly
(the packed popcount Pallas kernel in ops/pallas_xnor.py consumes the same params).
"""

from __future__ import annotations

import numpy as np

from .cfg import ConvSpec, ModelSpec


def binarize_params(spec: ModelSpec, params: list) -> list:
    """Add ``sign_weights`` (HWIO int8 +-1) and ``mean_arr`` [n] to xnor conv layers
    (reference: calculate_binary_weights, src/additionally.c:306-345)."""
    out: list = []
    for i, l in enumerate(spec.layers):
        p = params[i]
        if p is None or not isinstance(l, ConvSpec) or not l.xnor:
            out.append(p)
            continue
        q = dict(p)
        w = np.asarray(p["weights"], np.float32)          # HWIO
        # per-filter mean of |w| over H,W,I (reference: binarize_weights)
        mean = np.mean(np.abs(w), axis=(0, 1, 2)).astype(np.float32)
        q["mean_arr"] = mean
        q["sign_weights"] = np.where(w > 0, 1, -1).astype(np.int8)
        # bit-packed form for the Pallas popcount kernel (ops/pallas_xnor.py);
        # k_real is static (= size*size*c from the spec), not stored here
        from .ops.pallas_xnor import pack_weights
        packed, _, _ = pack_weights(w)
        q["packed_weights"] = packed
        out.append(q)
    return out


def has_xnor(spec: ModelSpec) -> bool:
    return any(isinstance(l, ConvSpec) and l.xnor for l in spec.layers)
