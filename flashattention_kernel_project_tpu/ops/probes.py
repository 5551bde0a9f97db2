"""Profiling probe kernels — isolate one roofline axis each.

TPU rebuild of the reference's `flashattn_forward_memory_bound/` family
(SURVEY.md section 2.5): each probe strips the fused attention kernel down
to a single bottleneck so stage costs can be measured independently:

  copy_probe           — K/V streaming only, no compute
                         (5.6.2 cp.async-stall analog: measures the HBM->VMEM
                         pipeline's achievable bandwidth)
  qk_probe             — QK^T matmuls only
                         (5.6.3 tensor-core-utilization analog for stage 1)
  softmax_chain_probe  — online-softmax arithmetic on synthesized scores
                         (5.6.4 math-pipe/Execution-Dependency analog)
  pv_probe             — PV matmuls only (stage 3, 6.9 analog)

Used by benchmarks/profile_attention.py for the stage-latency breakdown
(5.6.6 analog).
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


def _std_grid(b, h, n_q, n_kv):
    return dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )


def _kv_specs(block_k, d, group):
    return [
        pl.BlockSpec((1, 1, block_k, d), lambda bb, hh, i, j: (bb, hh // group, j, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bb, hh, i, j: (bb, hh // group, j, 0)),
    ]


def _make_probe(kernel_factory):
    """Shared wrapper: same grid/specs as the fused kernel, probe body."""

    @functools.partial(
        jax.jit, static_argnames=("block_q", "block_k", "interpret")
    )
    def probe(q, k, v, *, block_q=512, block_k=512, interpret=None):
        if interpret is None:
            interpret = default_interpret()
        b, hq, n, d = q.shape
        _, hkv, s, _ = k.shape
        group = hq // hkv
        n_q, n_kv = n // block_q, s // block_k
        kernel = kernel_factory(n_kv=n_kv, block_q=block_q, block_k=block_k, d=d)
        return pl.pallas_call(
            kernel,
            grid=(b, hq, n_q, n_kv),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, i, j: (bb, hh, i, 0)),
                *_kv_specs(block_k, d, group),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, d), lambda bb, hh, i, j: (bb, hh, i, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((b, hq, n, d), jnp.float32),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
            **_std_grid(b, hq, n_q, n_kv),
            interpret=interpret,
        )(q, k, v)

    return probe


def _copy_kernel_factory(*, n_kv, block_q, block_k, d):
    def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref):
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # touch each streamed tile with one cheap VPU add so the DMA can't be
        # DCE'd, but no matmul / exp — pure pipeline bandwidth. (Scalar VMEM
        # stores don't lower on TPU; use a broadcast row add.)
        acc_ref[:] += (
            k_ref[0, 0][:1, :].astype(jnp.float32)
            + v_ref[0, 0][:1, :].astype(jnp.float32)
        )

        @pl.when(j == n_kv - 1)
        def _():
            o_ref[0, 0] = acc_ref[:]

    return kernel


def _qk_kernel_factory(*, n_kv, block_q, block_k, d):
    def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref):
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # fold scores back to [block_q, d] so output cost matches the fused
        # kernel; sum is a cheap VPU reduce.
        acc_ref[:] += jnp.sum(s, axis=-1, keepdims=True)

        @pl.when(j == n_kv - 1)
        def _():
            o_ref[0, 0] = acc_ref[:]

    return kernel


def qk_kt_probe(q, k, v, *, block_q=512, block_k=512, interpret=None):
    """QK^T with K pre-transposed to [B, Hkv, D, S]: the dot becomes a plain
    NN matmul (contract q's lanes against kt's sublanes) instead of the NT
    form that contracts K's lane dim — A/B for whether Mosaic's NT matmul
    leaves MXU throughput on the table (the reference's v8 asked the same
    question with a host-side K transpose,
    flashattn_streaming_16x16_mw_v8.cu:2-6). `k` arrives [B, Hkv, S, D] and
    is transposed here (XLA relayout outside the kernel, O(S*D) per head)."""
    if interpret is None:
        interpret = default_interpret()
    b, hq, n, d = q.shape
    _, hkv, s, _ = k.shape
    group = hq // hkv
    n_q, n_kv = n // block_q, s // block_k
    kt = k.swapaxes(-1, -2)  # [B, Hkv, D, S]

    def kernel(q_ref, kt_ref, o_ref, acc_ref):
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        s_ = jax.lax.dot_general(
            q_ref[0, 0], kt_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += jnp.sum(s_, axis=-1, keepdims=True)

        @pl.when(j == n_kv - 1)
        def _():
            o_ref[0, 0] = acc_ref[:]

    return pl.pallas_call(
        kernel,
        grid=(b, hq, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, i, j: (bb, hh, i, 0)),
            pl.BlockSpec(
                (1, 1, d, block_k), lambda bb, hh, i, j: (bb, hh // group, 0, j)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bb, hh, i, j: (bb, hh, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, n, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        **_std_grid(b, hq, n_q, n_kv),
        interpret=interpret,
    )(q, kt)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def qk_packed_probe(q, k, *, block_q=256, block_k=512, interpret=None):
    """Bare QK^T at the PACKED d<=64 shape (VERDICT r4 task 5): the exact
    grid/blocks of _fwd_kernel_packed — q rows [group*block_q, 2d] (two
    heads' queries side by side) against a PRE-PACKED block-diagonal K tile
    [2*block_k, 2d], contraction depth 2d=128 — with qk_probe's sum-fold
    output stand-in. Measures the pure MXU envelope of the packed
    formulation: if it reads ~0.3x (like the unpacked d64 probes), the d64
    fused kernel at 0.35x is genuinely floored; if materially higher, the
    kernel is leaving packed headroom on the table. K packing rides XLA
    here (one O(S*D) relayout); the fused kernel packs per tile in-VPU —
    that cost is deliberately OUTSIDE this envelope."""
    if interpret is None:
        interpret = default_interpret()
    b, hq, n, d = q.shape
    _, hkv, s, _ = k.shape
    assert hkv % 2 == 0, hkv
    pairs = hkv // 2
    group = hq // hkv
    n_q, n_kv = n // block_q, s // block_k
    rows = group * block_q
    # q pair-packed along lanes (same layout as _fwd_packed's q_in)
    q_in = (
        q.reshape(b, pairs, 2, group, n, d)
        .transpose(0, 1, 3, 4, 2, 5)
        .reshape(b, pairs, group, n, 2 * d)
    )
    # K expanded block-diagonally per kv block: [[k_A, 0], [0, k_B]]
    kA = k[:, 0::2].reshape(b, pairs, n_kv, block_k, d)
    kB = k[:, 1::2].reshape(b, pairs, n_kv, block_k, d)
    z = jnp.zeros_like(kA)
    kp = jnp.concatenate(
        [jnp.concatenate([kA, z], -1), jnp.concatenate([z, kB], -1)], -2
    ).reshape(b, pairs, 2 * s, 2 * d)

    def kernel(q_ref, kp_ref, o_ref, acc_ref):
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        qv = q_ref[0, 0].reshape(rows, 2 * d)
        s_ = jax.lax.dot_general(
            qv, kp_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += jnp.sum(s_, axis=-1, keepdims=True)

        @pl.when(j == n_kv - 1)
        def _():
            o_ref[0, 0] = acc_ref[:].reshape(group, block_q, 2 * d)

    return pl.pallas_call(
        kernel,
        grid=(b, pairs, n_q, n_kv),
        in_specs=[
            pl.BlockSpec(
                (1, 1, group, block_q, 2 * d),
                lambda bb, hh, i, j: (bb, hh, 0, i, 0),
            ),
            pl.BlockSpec(
                (1, 1, 2 * block_k, 2 * d),
                lambda bb, hh, i, j: (bb, hh, j, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group, block_q, 2 * d),
            lambda bb, hh, i, j: (bb, hh, 0, i, 0),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, pairs, group, n, 2 * d), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((rows, 2 * d), jnp.float32)],
        **_std_grid(b, pairs, n_q, n_kv),
        interpret=interpret,
    )(q_in, kp)


def _pv_kernel_factory(*, n_kv, block_q, block_k, d):
    def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref):
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # synthesize a probability tile from q (no QK^T, no exp): a single
        # broadcast keeps this MXU-only.
        p = jnp.broadcast_to(
            q_ref[0, 0, :, :1], (block_q, block_k)
        ).astype(v_ref.dtype)
        acc_ref[:] += jax.lax.dot_general(
            p, v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(j == n_kv - 1)
        def _():
            o_ref[0, 0] = acc_ref[:]

    return kernel


def _softmax_chain_kernel_factory(*, n_kv, block_q, block_k, d):
    def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_scr, l_scr):
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)

        # synthesize scores on the fly (one broadcast multiply — matches the
        # reference probe's generated scores, 5.6.4 header), then run the
        # full online-softmax arithmetic chain.
        s = q_ref[0, 0, :, :1] * jnp.full(
            (block_q, block_k), 0.001, jnp.float32
        )
        m_prev = m_scr[:]
        l_prev = l_scr[:]
        m_tile = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_tile)
        scale_old = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scr[:] = l_prev * scale_old + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[:] = m_next
        acc_ref[:] = acc_ref[:] * scale_old[:, :1] + jnp.sum(
            p, axis=-1, keepdims=True
        )

        @pl.when(j == n_kv - 1)
        def _():
            o_ref[0, 0] = acc_ref[:] / (l_scr[:, :1] + 1e-6)

    return kernel


copy_probe = _make_probe(_copy_kernel_factory)
qk_probe = _make_probe(_qk_kernel_factory)
pv_probe = _make_probe(_pv_kernel_factory)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def softmax_chain_probe(q, k, v, *, block_q=512, block_k=512, interpret=None):
    if interpret is None:
        interpret = default_interpret()
    b, hq, n, d = q.shape
    _, hkv, s, _ = k.shape
    group = hq // hkv
    n_q, n_kv = n // block_q, s // block_k
    kernel = _softmax_chain_kernel_factory(
        n_kv=n_kv, block_q=block_q, block_k=block_k, d=d
    )
    return pl.pallas_call(
        kernel,
        grid=(b, hq, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, i, j: (bb, hh, i, 0)),
            *_kv_specs(block_k, d, group),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bb, hh, i, j: (bb, hh, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, n, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
        ],
        **_std_grid(b, hq, n_q, n_kv),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def stream_copy_probe(x, *, block_rows=128, interpret=None):
    """Copy-only 50%-write streaming kernel (VERDICT r4 task 4b): reads
    [R, C] and writes [R, C] with one trivial VPU op — NO softmax math —
    to measure the machine's balanced read+write plateau at the softmax
    ladder's shape. The r3 journal DERIVED a ~323 GB/s wall for the
    softmax rung from kernel-body invariance; this probe measures whether
    that wall belongs to the machine (copy hits it too) or to the kernel
    (copy goes faster). The +1.0 prevents XLA from aliasing the output
    onto the input. Reference analog: the cp.async stall probe's
    stream-only discipline (flashattn_forward_cp_async_stall.cu:3-10)."""
    if interpret is None:
        interpret = default_interpret()
    r, c = x.shape
    while r % block_rows:
        block_rows //= 2  # snap to a divisor (the r3 softmax pad lesson)
    # scoped-VMEM: in+out double-buffered = 4 x block f32 (512-row blocks
    # at 4096 cols measured 32 MB scoped and OOM'd)
    while 4 * block_rows * c * x.dtype.itemsize > (12 << 20):
        block_rows //= 2
    n_r = r // block_rows

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    return pl.pallas_call(
        kernel,
        grid=(n_r,),
        in_specs=[pl.BlockSpec((block_rows, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x)
