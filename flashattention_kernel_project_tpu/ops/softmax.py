"""Softmax microkernels + the online/streaming softmax state machine.

Reference ladder (SURVEY.md section 2.2): naive 3-pass block softmax
(softmax_naive_baseline.cu:56-130) -> warp-shuffle (softmax_warp_shfl
_baseline.cu:69-115) -> block hybrid two-level reduce
(softmax_block_hybrid.cu:74-169). On TPU the whole ladder collapses: the VPU
reduces an (8,128) register row natively, so one Pallas kernel with jnp
reductions is the "hybrid" endpoint; the interesting part is the *online*
state machine, which this module exposes as reusable pure functions with two
mathematically equivalent disciplines:

  1. rescale-normalized  (flashattn_forward_fused_5_4_2.cu:150-204):
       alpha = exp(m_old - m_new) * l_old / l_new; O *= alpha before adding
  2. unnormalized streaming merge (flashattn_streaming_16x16.cu:15-24):
       m=max; l = la*ea + lb*eb; y = ya*ea + yb*eb; O = y/l at the end

Discipline 2's merge is ASSOCIATIVE — it is the combiner for split-KV
flash-decode and ring/context-parallel attention (property-tested in
tests/test_softmax.py because Phase 5 load-bears on it).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_kernel_project_tpu.utils.platform import default_interpret

NEG_INF = float(-1e30)  # finite -inf stand-in; exp() of it flushes to 0 in bf16/fp32


# ---------------------------------------------------------------------------
# Row softmax kernel (the whole naive->warp->hybrid ladder, one kernel)
# ---------------------------------------------------------------------------

_LOG2E = 1.4426950408889634


def _softmax_kernel(x_ref, o_ref):
    # log2 domain: one fused scale on the (x - m) pass, then exp2 —
    # skipping exp's internal range-reduction multiply per element (the
    # same discipline the attention kernels run); normalize via one
    # [rows, 1] reciprocal broadcast-multiplied over the tile (a
    # full-tile divide is the slower VPU op)
    x = x_ref[:].astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp2((x - m) * _LOG2E)
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[:] = (e * r).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def softmax(
    x: jax.Array, *, block_rows: int = 512, interpret: bool | None = None
) -> jax.Array:
    """Row softmax over the last axis. Rows are processed in VMEM blocks; the
    reference's 3 SMEM passes / shuffle trees become single VPU reductions."""
    if interpret is None:
        interpret = default_interpret()
    orig_shape = x.shape
    n = orig_shape[-1]
    x2 = x.reshape(-1, n)
    rows = x2.shape[0]
    # VMEM budget: double-buffered in + out blocks plus f32 temps is ~6
    # live copies of the block. The default 16 MB scoped limit capped
    # blocks at ~144 rows at n=4096 — too many small programs (the DMA
    # never reached streaming rate); raise the limit and keep ~6x the
    # block under it.
    vmem_mb = 64
    cap = max(8, (vmem_mb * 2**20 - 2**20) // (6 * 4 * n) // 8 * 8)
    block_rows = min(block_rows, rows, cap)
    # prefer a block count that DIVIDES rows: jnp.pad + the output slice
    # each copy the whole array, and at HBM-resident shapes those two
    # hidden copies dominate (the r2 "softmax anomaly": 8192 rows with a
    # 144-row VMEM-capped block padded to 8208 — 216 GB/s measured, on an
    # idle host, across three different kernel bodies; with the 128-row
    # divisor block the pad/slice disappear)
    b = block_rows
    while rows % b and b > 8:
        b -= 8
    if rows % b == 0:
        block_rows = b
    pad = (-rows) % block_rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _softmax_kernel,
        grid=(x2.shape[0] // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, n), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_rows, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20,
        ),
        interpret=interpret,
    )(x2)
    return out[:rows].reshape(orig_shape)


# ---------------------------------------------------------------------------
# Online-softmax state machine (pure functions, used inside Pallas kernels,
# lax.scan bodies, and across-device merges alike)
# ---------------------------------------------------------------------------

class SoftmaxState(NamedTuple):
    """Unnormalized streaming softmax partial over some slice of keys.

    m: running row max            [..., rows]
    l: running sum of exp(s - m)  [..., rows]
    y: running exp-weighted V sum [..., rows, d_v]  (UNNORMALIZED)
    """

    m: jax.Array
    l: jax.Array
    y: jax.Array


def init_state(rows_shape: tuple[int, ...], d_v: int, dtype=jnp.float32) -> SoftmaxState:
    return SoftmaxState(
        m=jnp.full(rows_shape, NEG_INF, dtype),
        l=jnp.zeros(rows_shape, dtype),
        y=jnp.zeros((*rows_shape, d_v), dtype),
    )


def tile_state(scores: jax.Array, values: jax.Array) -> SoftmaxState:
    """State of a single tile: scores [..., rows, cols], values [..., cols, d_v].
    Masked-out entries must already be NEG_INF in `scores`."""
    m = jnp.max(scores, axis=-1)
    e = jnp.exp(scores - m[..., None])
    return SoftmaxState(m=m, l=jnp.sum(e, axis=-1), y=e @ values)


def merge(a: SoftmaxState, b: SoftmaxState) -> SoftmaxState:
    """Associative merge (flashattn_streaming_16x16.cu:15-24 discipline).

    Commutative and associative up to fp rounding, so any partition of the
    key axis — KV tiles in a kernel, split-KV shards, ring-attention hops —
    combines with this one function.
    """
    m = jnp.maximum(a.m, b.m)
    ea = jnp.exp(a.m - m)
    eb = jnp.exp(b.m - m)
    return SoftmaxState(
        m=m,
        l=a.l * ea + b.l * eb,
        y=a.y * ea[..., None] + b.y * eb[..., None],
    )


def finalize(state: SoftmaxState, eps: float = 0.0) -> jax.Array:
    """O = y / l — the single final normalize (streaming discipline)."""
    return state.y / (state.l + eps)[..., None]


# ---------------------------------------------------------------------------
# Online softmax over column blocks as an executable spec (the streaming
# microkernel in isolation — reference section 2.6's (m,l) loop without the
# attention around it). A correctness anchor for the fused kernel.
# ---------------------------------------------------------------------------

def online_softmax_reference(x: jax.Array, block_cols: int = 512) -> jax.Array:
    """Two-discipline online softmax in pure lax.scan form (jnp, not Pallas):
    the executable spec the fused attention kernel is tested against."""
    n = x.shape[-1]
    pad = (-n) % block_cols
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=NEG_INF)
    n_blocks = xp.shape[-1] // block_cols
    tiles = jnp.moveaxis(
        xp.reshape(*xp.shape[:-1], n_blocks, block_cols), -2, 0
    )  # [n_blocks, ..., block_cols]

    def step(carry, tile):
        m, l = carry
        m_tile = jnp.max(tile, axis=-1)
        m_new = jnp.maximum(m, m_tile)
        l_new = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(tile - m_new[..., None]), axis=-1)
        return (m_new, l_new), None

    m0 = jnp.full(xp.shape[:-1], NEG_INF, jnp.float32)
    l0 = jnp.zeros(xp.shape[:-1], jnp.float32)
    (m, l), _ = jax.lax.scan(step, (m0, l0), tiles.astype(jnp.float32))
    out = jnp.exp(x.astype(jnp.float32) - m[..., None]) / l[..., None]
    return out.astype(x.dtype)
