"""Streaming attention with an EXPLICIT double-buffered DMA pipeline.

This is the TPU rebuild of the reference's producer/consumer ladder
(SURVEY.md sections 2.6-2.8): cp.async ping-pong buffers
(flashattn_streaming_16x16_mw_cpasync.cu), warp-specialized loader/compute
roles with spin-flag handshakes (..._mw_v5_warp_specialize.cu:128-258),
mbarrier variants (..._mw_v9.cu:74-101). On TPU the loader "warp" is a DMA
engine: `pltpu.make_async_copy` HBM->VMEM with per-slot DMA semaphores IS
the handshake, correct by construction — no volatile flags, no hang-hunting
(the reference needed bounded spins + [STUCK] printf, section 2.8).

The grid-pipelined kernels (flash_attention / flash_decode) let Pallas emit
this pipeline implicitly; this module writes it BY HAND, both as the
capability-parity rung and as an A/B for the pipeline emitter. Decode-shaped
problem (fixed Q block, K/V streamed over seq), unnormalized (m, l, y)
streaming merge with final y/l — exactly the reference's discipline
(flashattn_streaming_16x16.cu:15-24).

Perf note (round 2): the reference's own benchmark shape (B=1024 tiny
sequences) is PROGRAM-BOUND on a TPU — the TensorCore runs grid programs
serially at a measured ~0.3 us fixed cost each, so 1024 one-sequence
programs cost ~300 us against a ~40 us DMA floor (the round-1 rung read
0.06x of the HBM roofline for exactly this reason). `seq_chunk` folds a
contiguous CHUNK of sequences into each program: ONE wide DMA per tile
(sequences are contiguous in the [B, Hkv, S, D] layout) and an unrolled
per-sequence compute loop — same explicit ping-pong pipeline, program
count divided by the chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_kernel_project_tpu.ops.softmax import NEG_INF
from flashattention_kernel_project_tpu.utils.platform import default_interpret

_LANES = 128


def _streaming_kernel(
    len_ref,  # SMEM [B, 1]
    q_ref,  # VMEM [1, 1, NB * GP, D]
    k_hbm,  # ANY  [B, Hkv, S, D] — DMA'd manually
    v_hbm,
    o_ref,  # VMEM [1, 1, NB * GP, D]
    k_buf,  # VMEM [2, NB, block_s, D] ping-pong
    v_buf,
    m_scr,  # VMEM [NB * GP, LANES]
    l_scr,
    acc_scr,  # VMEM [NB * GP, D]
    sem,  # DMA semaphores [2, 2] (slot x {k, v})
    *,
    block_s: int,
    n_tiles: int,
    seq_chunk: int,
    gp: int,
):
    bc = pl.program_id(0)  # chunk index: sequences [bc*NB, (bc+1)*NB)
    h = pl.program_id(1)
    nb = seq_chunk
    d = q_ref.shape[3]

    def k_dma(t, slot):
        # ONE descriptor covers the whole chunk's tile: sequences are the
        # leading (outermost) axis of the cache, so [nb, block_s, D] is a
        # single strided copy — the chunk amortizes both the program cost
        # and the descriptor cost
        return pltpu.make_async_copy(
            k_hbm.at[pl.ds(bc * nb, nb), h, pl.ds(t * block_s, block_s), :],
            k_buf.at[slot],
            sem.at[slot, 0],
        )

    def v_dma(t, slot):
        return pltpu.make_async_copy(
            v_hbm.at[pl.ds(bc * nb, nb), h, pl.ds(t * block_s, block_s), :],
            v_buf.at[slot],
            sem.at[slot, 1],
        )

    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

    # the chunk streams to the longest member's horizon
    max_len = len_ref[bc * nb, 0]
    for i in range(1, nb):
        max_len = jnp.maximum(max_len, len_ref[bc * nb + i, 0])

    # producer warm-up: tile 0 in flight before the loop (the reference's
    # load(t)/compute(t-1) software pipeline, v5_cp_async.cu:221-251)
    k_dma(0, 0).start()
    v_dma(0, 0).start()

    q = q_ref[0, 0]  # [NB * GP, D]

    def body(t, _):
        slot = jax.lax.rem(t, 2)
        next_slot = 1 - slot

        # producer: issue tile t+1 into the other buffer while t computes
        @pl.when(jnp.logical_and(t + 1 < n_tiles, (t + 1) * block_s < max_len))
        def _():
            k_dma(t + 1, next_slot).start()
            v_dma(t + 1, next_slot).start()

        # consumer: wait for tile t (the mbarrier/ready-flag analog).
        # Only tiles that were actually issued may be waited on — waiting on
        # a never-started DMA is the deadlock class the reference spent its
        # whole section-2.8 ladder debugging (hang-hunt printf, handshake
        # flags); here the guard is one predicate.
        issued = jnp.logical_or(t == 0, t * block_s < max_len)

        @pl.when(issued)
        def _():
            k_dma(t, slot).wait()
            v_dma(t, slot).wait()

        @pl.when(t * block_s < max_len)
        def _():
            # per-sequence compute, unrolled over the chunk: tiny matmuls
            # (the MXU is idle-rich here — the problem is bandwidth-bound),
            # state updates vectorized per sequence on its own GP rows
            for i in range(nb):
                length = len_ref[bc * nb + i, 0]
                ql = q[i * gp : (i + 1) * gp]  # [GP, D]
                k = k_buf[slot, i]  # [block_s, D]
                v = v_buf[slot, i]
                s = jax.lax.dot_general(
                    ql, k.astype(ql.dtype), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                col = t * block_s + jax.lax.broadcasted_iota(
                    jnp.int32, (gp, block_s), 1
                )
                mask = col < length
                s = jnp.where(mask, s, NEG_INF)
                m_prev = m_scr[i * gp : (i + 1) * gp]
                m_tile = jnp.max(s, axis=-1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_tile)
                alpha = jnp.exp(m_prev - m_next)
                e = jnp.where(mask, jnp.exp(s - m_next[:, :1]), 0.0)
                l_scr[i * gp : (i + 1) * gp] = (
                    l_scr[i * gp : (i + 1) * gp] * alpha
                    + jnp.sum(e, axis=-1, keepdims=True)
                )
                m_scr[i * gp : (i + 1) * gp] = m_next
                y = jax.lax.dot_general(
                    e.astype(v.dtype), v.astype(ql.dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_scr[i * gp : (i + 1) * gp] = (
                    acc_scr[i * gp : (i + 1) * gp] * alpha[:, :1] + y
                )

        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)

    l = l_scr[:, :1]
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_s", "sm_scale", "interpret", "seq_chunk")
)
def streaming_decode(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    lengths: jax.Array,
    *,
    block_s: int = 512,
    sm_scale: float | None = None,
    interpret: bool | None = None,
    seq_chunk: int = 1,
) -> jax.Array:
    """flash_decode with a hand-rolled double-buffered DMA pipeline.

    Same contract as ops.flash_decode (q [B,Hq,D], caches [B,Hkv,S,D],
    lengths [B]) but K/V stay in HBM/ANY and are streamed tile-by-tile with
    explicit async copies — the reference's warp-specialization rung.

    seq_chunk folds that many sequences into each program (B must divide;
    see the module docstring): the lever that takes the reference's
    B=1024-tiny-sequences shape from program-bound to bandwidth-bound.
    """
    if interpret is None:
        interpret = default_interpret()
    b, hq, d = q.shape
    _, hkv, s_max, _ = k_cache.shape
    g = hq // hkv
    gp = max(8, g)
    nb = seq_chunk
    assert b % nb == 0, (b, nb)
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    q = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)

    qg = q.reshape(b, hkv, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    # chunk layout: [B/nb, Hkv, nb * GP, D] — sequence i of chunk c owns
    # q/out rows [i*GP, (i+1)*GP)
    qg = (
        qg.reshape(b // nb, nb, hkv, gp, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b // nb, hkv, nb * gp, d)
    )

    block_s = min(block_s, s_max)
    pad_s = (-s_max) % block_s
    if pad_s:
        pads = ((0, 0), (0, 0), (0, pad_s), (0, 0))
        k_cache, v_cache = jnp.pad(k_cache, pads), jnp.pad(v_cache, pads)
    n_tiles = k_cache.shape[2] // block_s

    kernel = functools.partial(
        _streaming_kernel, block_s=block_s, n_tiles=n_tiles, seq_chunk=nb,
        gp=gp,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // nb, hkv),
        in_specs=[
            pl.BlockSpec((b, 1), lambda bb, h: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nb * gp, d), lambda bb, h: (bb, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, nb * gp, d), lambda bb, h: (bb, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b // nb, hkv, nb * gp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, nb, block_s, d), k_cache.dtype),
            pltpu.VMEM((2, nb, block_s, d), v_cache.dtype),
            pltpu.VMEM((nb * gp, _LANES), jnp.float32),
            pltpu.VMEM((nb * gp, _LANES), jnp.float32),
            pltpu.VMEM((nb * gp, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths.reshape(b, 1).astype(jnp.int32), qg, k_cache, v_cache)
    out = (
        out.reshape(b // nb, hkv, nb, gp, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b, hkv, gp, d)
    )
    return out[:, :, :g].reshape(b, hq, d)
