"""CPU reference oracles — the L4 layer of the reference, in numpy.

The reference pairs every kernel with a naive CPU implementation, usually
fp64-accumulated to decouple oracle error from kernel error (SURVEY.md
section 4.1: `cpu_gemm_ref` naive_gemm.cu:60-74, `qk_cpu_ref`
qk_tiled_5_1_1.cu:104-125, `flashattn_cpu_ref`
flashattn_forward_fused_5_4_2.cu:224-271, streaming reference
flashattn_streaming_16x16.cu:283-348). Same idea here, vectorized numpy,
fp64 accumulation throughout.
"""

from __future__ import annotations

import numpy as np


def gemm(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """C = A @ B with fp64 accumulation. Accepts leading batch dims."""
    return (a.astype(np.float64) @ b.astype(np.float64)).astype(np.float32)


def gemm_fused_epilogue(
    a: np.ndarray, b: np.ndarray, bias: np.ndarray, residual: np.ndarray
) -> np.ndarray:
    """C = ReLU(A@B + bias[col]) + residual — mirrors the reference's fused
    epilogue (gemm_fused_epilogue.cu:91-109)."""
    c = a.astype(np.float64) @ b.astype(np.float64)
    c = np.maximum(c + bias.astype(np.float64), 0.0) + residual.astype(np.float64)
    return c.astype(np.float32)


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x64 = x.astype(np.float64)
    m = np.max(x64, axis=axis, keepdims=True)
    e = np.exp(x64 - m)
    return (e / np.sum(e, axis=axis, keepdims=True)).astype(np.float32)


def attention(
    q: np.ndarray,
    k: np.ndarray,
    v: np.ndarray,
    *,
    scale: float | None = None,
    causal: bool = False,
    q_offset: int = 0,
    window: int | None = None,
    sinks: int = 0,
) -> np.ndarray:
    """Naive attention oracle, [..., N, D] x [..., S, D] -> [..., N, Dv].

    `q_offset` positions the query block within the KV sequence for causal
    decode (query i attends to kv j iff j <= i + q_offset). `window` (with
    causal) limits each query to its `window` most recent keys incl. self;
    `sinks` keeps the first `sinks` keys visible regardless (StreamingLLM).
    """
    q64 = q.astype(np.float64)
    k64 = k.astype(np.float64)
    v64 = v.astype(np.float64)
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    # batched @ dispatches to BLAS dgemm; einsum's naive loop is ~6x slower
    # at the headline 4K shapes (measured), which matters for on-chip verify
    scores = (q64 @ k64.swapaxes(-1, -2)) * scale
    if causal:
        n, s = scores.shape[-2], scores.shape[-1]
        row = np.arange(n)[:, None] + q_offset
        mask = np.arange(s)[None, :] > row
        if window is not None:
            out_of_band = np.arange(s)[None, :] <= row - window
            if sinks:
                out_of_band &= np.arange(s)[None, :] >= sinks
            mask |= out_of_band
        scores = np.where(mask, -np.inf, scores)
    m = np.max(scores, axis=-1, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)  # fully-masked rows
    e = np.exp(scores - m)
    p = e / np.maximum(np.sum(e, axis=-1, keepdims=True), 1e-30)
    return (p @ v64).astype(np.float32)


def gqa_attention(
    q: np.ndarray,
    k: np.ndarray,
    v: np.ndarray,
    *,
    scale: float | None = None,
    causal: bool = False,
    q_offset: int = 0,
    window: int | None = None,
    sinks: int = 0,
) -> np.ndarray:
    """Grouped-query attention oracle. q: [B, Hq, N, D], k/v: [B, Hkv, S, D]."""
    hq, hkv = q.shape[1], k.shape[1]
    assert hq % hkv == 0
    group = hq // hkv
    k = np.repeat(k, group, axis=1)
    v = np.repeat(v, group, axis=1)
    return attention(
        q, k, v, scale=scale, causal=causal, q_offset=q_offset, window=window,
        sinks=sinks,
    )


def online_softmax_merge(state_a, state_b):
    """Associative merge of unnormalized streaming softmax partials.

    The second accumulation discipline of the reference
    (flashattn_streaming_16x16.cu:15-24,239-262):
      m = max(ma, mb); a = exp(ma-m); b = exp(mb-m)
      l = la*a + lb*b;  y = ya*a + yb*b;  O = y/l at the very end.
    This merge is the combiner for split-KV decode and ring attention.
    """
    ma, la, ya = state_a
    mb, lb, yb = state_b
    m = np.maximum(ma, mb)
    a = np.exp(ma - m)
    b = np.exp(mb - m)
    return m, la * a + lb * b, ya * a[..., None] + yb * b[..., None]
