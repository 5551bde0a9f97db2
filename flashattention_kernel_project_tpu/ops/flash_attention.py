"""Fused FlashAttention forward — the reference ladder's endpoint, TPU-native.

Reference lineage (SURVEY.md sections 2.1/2.4/2.5): QK^T tiled
(qk_tiled_5_1_1.cu:28-101) + online softmax with O-rescale
(flashattn_forward_fused_5_4_2.cu:150-204, the corrected
`alpha = exp(m_old-m_new)*l_old/l_new` discipline) + WMMA PV
(flashattn_forward_wmma_v5_cp_async.cu:394-443), with K/V streamed through
a double-buffered pipeline (ibid:221-251).

TPU design (NOT a translation):
  * one Pallas kernel; grid = (batch, q_heads, q_blocks, kv_blocks) with the
    KV dimension innermost and "arbitrary" so a revolving (m, l, acc) carry
    lives in VMEM scratch across KV steps — the warp-level (m,l) registers of
    the reference become whole-block VPU state;
  * QK^T and PV hit the MXU via jnp.dot with fp32 accumulation (the WMMA
    16x16 fragment dance is simply a 128x128-tiled dot here);
  * the cp.async ping-pong is Pallas' implicit multi-buffered grid pipeline:
    block t+1's HBM->VMEM DMA overlaps compute on block t;
  * GQA folds the KV-head mapping into the K/V index_map (heads were only a
    grid dim in the reference);
  * causal + sequence-tail masks are explicit iota comparisons — the
    reference assumed multiple-of-tile sizes everywhere
    (flashattn_forward_wmma_v5_cp_async.cu:114); we mask instead;
  * fully-masked KV blocks are skipped with pl.when (compute-side skip).

The backward pass is a blockwise recompute (FlashAttention-2 style) in plain
JAX under lax.scan — correct and memory-linear; a Pallas backward kernel is a
later optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_kernel_project_tpu.ops.gemm import _precision
from flashattention_kernel_project_tpu.ops.softmax import NEG_INF
from flashattention_kernel_project_tpu.utils.platform import default_interpret

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
_LANES = 128  # VPU lane width; m/l scratch is lane-broadcast for alignment


def _fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    n_kv: int,
    causal: bool,
    q_offset: int,
    kv_len: int,
    block_q: int,
    block_k: int,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Causal skip: KV block strictly above the diagonal touches nothing.
    if causal:
        diag_ok = kv_idx * block_k <= q_idx * block_q + q_offset + (block_q - 1)
    else:
        diag_ok = True

    @pl.when(diag_ok)
    def _compute():
        # sm_scale is pre-folded into q by the wrapper: one fewer VPU pass
        # over the [block_q, block_k] score tile (the VPU passes over that
        # tile are the kernel's measured bottleneck — docs/perf_journal.md).
        q = q_ref[0, 0]  # [block_q, d]
        k = k_ref[0, 0]  # [block_k, d]
        v = v_ref[0, 0]  # [block_k, d_v]

        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(q.dtype),
        )

        # Tail mask (padded keys) and causal mask, both as iota compares.
        need_tail = kv_len % block_k != 0
        mask = None
        if causal or need_tail:
            col = kv_idx * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = col < kv_len
            if causal:
                row = (
                    q_idx * block_q
                    + q_offset
                    + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                )
                mask = jnp.logical_and(mask, col <= row)
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]  # [block_q, LANES] lane-broadcast
        l_prev = l_scr[:]
        m_tile = jnp.max(s, axis=-1, keepdims=True)  # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_tile)  # broadcast -> [block_q, LANES]
        scale_old = jnp.exp(m_prev - m_next)  # [block_q, LANES]
        # exp computed at the PV matmul's input precision: for bf16 inputs
        # this packs 2x on the VPU and skips the separate f32->bf16 convert
        # pass before the MXU. max-subtraction keeps the argument in
        # [-inf, 0], where bf16 exp has ~3 decimal digits — inside the 1e-2
        # numerics gate (verified vs oracle in tests and on-chip).
        p = jnp.exp((s - m_next[:, :1]).astype(v.dtype))  # [block_q, block_k]
        if mask is not None:
            # A row whose every column is masked in this KV block has
            # s == m_next == NEG_INF, so exp(s - m_next) would be 1, not 0
            # (the reference's 5.4-style corruption in a new disguise) —
            # zero masked entries explicitly.
            p = jnp.where(mask, p, jnp.zeros_like(p))
        l_next = l_prev * scale_old + jnp.sum(
            p, axis=-1, keepdims=True, dtype=jnp.float32
        )

        m_scr[:] = m_next
        l_scr[:] = l_next
        pv = jax.lax.dot_general(
            p,
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(v.dtype),
        )
        acc_scr[:] = acc_scr[:] * scale_old[:, :1] + pv

    @pl.when(kv_idx == n_kv - 1)
    def _finish():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        # logsumexp residual for the backward pass / merges
        lse = m_scr[:, :1] + jnp.log(safe_l)
        lse_ref[0, 0] = jnp.where(l == 0.0, NEG_INF, lse)


def _fwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool,
    sm_scale: float | None,
    q_offset: int,
    block_q: int,
    block_k: int,
    interpret: bool | None,
):
    if interpret is None:
        interpret = default_interpret()
    b, hq, n, d = q.shape
    _, hkv, s, _ = k.shape
    d_v = v.shape[-1]
    assert hq % hkv == 0, (hq, hkv)
    group = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    # fold the score scale into q (cost O(N*D), saves an O(N*S) VPU pass)
    q = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)

    block_q = min(block_q, max(n, 8))
    block_k = min(block_k, max(s, 128))
    pad_q = (-n) % block_q
    pad_k = (-s) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    np_, sp = q.shape[2], k.shape[2]
    n_q, n_kv = np_ // block_q, sp // block_k

    kernel = functools.partial(
        _fwd_kernel,
        n_kv=n_kv,
        causal=causal,
        q_offset=q_offset,
        kv_len=s,
        block_q=block_q,
        block_k=block_k,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, hq, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, h, i, j: (bb, h, i, 0)),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda bb, h, i, j: (bb, h // group, j, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, d_v), lambda bb, h, i, j: (bb, h // group, j, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d_v), lambda bb, h, i, j: (bb, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bb, h, i, j: (bb, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, np_, d_v), q.dtype),
            jax.ShapeDtypeStruct((b, hq, np_, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d_v), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * np_ * sp * d,
            bytes_accessed=(
                q.size * q.dtype.itemsize
                + k.size * k.dtype.itemsize
                + v.size * v.dtype.itemsize
                + b * hq * np_ * d_v * q.dtype.itemsize
            ),
            transcendentals=b * hq * np_ * sp,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :n], lse[:, :, :n, 0]


# ---------------------------------------------------------------------------
# Ragged variant: per-batch KV lengths and query offsets (chunked prefill
# against a live cache; a capability the reference lacked — it assumed
# multiple-of-tile sizes everywhere, e.g. flashattn_forward_wmma_v5_cp_async
# .cu:114). Lengths/offsets ride in SMEM, masks become dynamic compares.
# ---------------------------------------------------------------------------

def _fwd_kernel_ragged(
    len_ref,  # SMEM [B, 1] int32: valid KV tokens per batch row
    off_ref,  # SMEM [B, 1] int32: causal query-position offset per batch row
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    n_kv: int,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
):
    b = pl.program_id(0)
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    kv_len = len_ref[b, 0]
    q_off = off_ref[b, 0]

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    live = kv_idx * block_k < kv_len
    if causal:
        live = jnp.logical_and(
            live, kv_idx * block_k <= q_idx * block_q + q_off + (block_q - 1)
        )

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(q.dtype),
        ) * sm_scale

        col = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = col < kv_len
        if causal:
            row = (
                q_idx * block_q
                + q_off
                + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            )
            mask = jnp.logical_and(mask, col <= row)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]
        l_prev = l_scr[:]
        m_tile = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_tile)
        scale_old = jnp.exp(m_prev - m_next)
        p = jnp.where(mask, jnp.exp(s - m_next[:, :1]), 0.0)
        l_next = l_prev * scale_old + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[:] = m_next
        l_scr[:] = l_next
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(v.dtype),
        )
        acc_scr[:] = acc_scr[:] * scale_old[:, :1] + pv

    @pl.when(kv_idx == n_kv - 1)
    def _finish():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        lse = m_scr[:, :1] + jnp.log(safe_l)
        lse_ref[0, 0] = jnp.where(l == 0.0, NEG_INF, lse)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret"),
)
def flash_attention_ragged(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_lens: jax.Array,
    q_offsets: jax.Array,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused attention with per-batch KV lengths and causal query offsets.

    q: [B, Hq, N, D]; k/v: [B, Hkv, S_max, D] (e.g. a padded KV cache);
    kv_lens: [B] valid keys per row; q_offsets: [B] position of query 0
    (query i attends key j iff j <= i + q_offsets[b], and j < kv_lens[b]).
    Forward-only (serving path). Returns [B, Hq, N, Dv].
    """
    if interpret is None:
        interpret = default_interpret()
    b, hq, n, d = q.shape
    _, hkv, s, _ = k.shape
    d_v = v.shape[-1]
    group = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    block_q = min(block_q, max(n, 8))
    block_k = min(block_k, max(s, 128))
    pad_q = (-n) % block_q
    pad_k = (-s) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    np_, sp = q.shape[2], k.shape[2]
    n_q, n_kv = np_ // block_q, sp // block_k

    kernel = functools.partial(
        _fwd_kernel_ragged,
        n_kv=n_kv,
        sm_scale=sm_scale,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
    )
    out, _ = pl.pallas_call(
        kernel,
        grid=(b, hq, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((b, 1), lambda bb, h, i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1), lambda bb, h, i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bb, h, i, j: (bb, h, i, 0)),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda bb, h, i, j: (bb, h // group, j, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, d_v), lambda bb, h, i, j: (bb, h // group, j, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d_v), lambda bb, h, i, j: (bb, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bb, h, i, j: (bb, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, np_, d_v), q.dtype),
            jax.ShapeDtypeStruct((b, hq, np_, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d_v), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        kv_lens.reshape(b, 1).astype(jnp.int32),
        q_offsets.reshape(b, 1).astype(jnp.int32),
        q, k, v,
    )
    return out[:, :, :n]


# ---------------------------------------------------------------------------
# Blockwise backward (FlashAttention-2 recompute) in plain JAX
# ---------------------------------------------------------------------------

def _bwd_reference(res, g, causal, sm_scale, q_offset, block_k):
    q, k, v, out, lse = res
    b, hq, n, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    kr = jnp.repeat(k, group, axis=1)
    vr = jnp.repeat(v, group, axis=1)

    qf = q.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    delta = jnp.sum(out.astype(jnp.float32) * gf, axis=-1)  # [b,hq,n]

    s_len = k.shape[2]
    pad = (-s_len) % block_k
    if pad:
        kr = jnp.pad(kr, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, 0), (0, pad), (0, 0)))
    n_blocks = kr.shape[2] // block_k
    k_blocks = jnp.moveaxis(
        kr.reshape(b, hq, n_blocks, block_k, d), 2, 0
    ).astype(jnp.float32)
    v_blocks = jnp.moveaxis(
        vr.reshape(b, hq, n_blocks, block_k, -1), 2, 0
    ).astype(jnp.float32)

    row = jnp.arange(n)[:, None] + q_offset

    def step(dq, inputs):
        j, kb, vb = inputs
        s = jnp.einsum("bhnd,bhkd->bhnk", qf, kb) * sm_scale
        col = j * block_k + jnp.arange(block_k)[None, :]
        mask = col < s_len
        if causal:
            mask = jnp.logical_and(mask, col <= row)
        p = jnp.where(mask, jnp.exp(s - lse[..., None]), 0.0)
        dv = jnp.einsum("bhnk,bhnd->bhkd", p, gf)
        dp = jnp.einsum("bhnd,bhkd->bhnk", gf, vb)
        ds = p * (dp - delta[..., None]) * sm_scale
        dq = dq + jnp.einsum("bhnk,bhkd->bhnd", ds, kb)
        dk = jnp.einsum("bhnk,bhnd->bhkd", ds, qf)
        return dq, (dk, dv)

    dq0 = jnp.zeros_like(qf)
    dq, (dk_blocks, dv_blocks) = jax.lax.scan(
        step, dq0, (jnp.arange(n_blocks), k_blocks, v_blocks)
    )
    dk = jnp.moveaxis(dk_blocks, 0, 2).reshape(b, hq, -1, d)[:, :, :s_len]
    dv = jnp.moveaxis(dv_blocks, 0, 2).reshape(b, hq, -1, v.shape[-1])[:, :, :s_len]
    # fold GQA groups back onto the KV heads
    dk = dk.reshape(b, hkv, group, s_len, d).sum(axis=2)
    dv = dv.reshape(b, hkv, group, s_len, v.shape[-1]).sum(axis=2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_attention(q, k, v, causal, sm_scale, q_offset, block_q, block_k, interpret):
    out, _ = _fwd(q, k, v, causal, sm_scale, q_offset, block_q, block_k, interpret)
    return out


def _flash_attention_fwd(q, k, v, causal, sm_scale, q_offset, block_q, block_k, interpret):
    out, lse = _fwd(q, k, v, causal, sm_scale, q_offset, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_attention_bwd(causal, sm_scale, q_offset, block_q, block_k, interpret, res, g):
    if sm_scale is None:
        sm_scale = 1.0 / (res[0].shape[-1] ** 0.5)
    return _bwd_reference(res, g, causal, sm_scale, q_offset, block_k)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    q_offset: int = 0,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused multi-head / grouped-query FlashAttention forward.

    Args:
      q: [batch, q_heads, q_len, head_dim]
      k, v: [batch, kv_heads, kv_len, head_dim]; q_heads % kv_heads == 0.
      causal: apply causal mask; query i sees key j iff j <= i + q_offset.
      q_offset: static position offset of the query block within the KV
        sequence (for chunked prefill).
      sm_scale: score scale, default 1/sqrt(head_dim).

    Returns [batch, q_heads, q_len, head_dim_v]; differentiable.
    """
    return _flash_attention(
        q, k, v, causal, sm_scale, q_offset, block_q, block_k, interpret
    )


def flash_attention_with_lse(
    q, k, v, *, causal=False, sm_scale=None, q_offset=0,
    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K, interpret=None,
):
    """Forward that also returns logsumexp [b, hq, n] — the (m, l) carry the
    ring/context-parallel layer merges across devices (non-differentiable)."""
    return _fwd(q, k, v, causal, sm_scale, q_offset, block_q, block_k, interpret)
