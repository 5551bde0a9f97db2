"""GEMM ladder — TPU-native rebuild of the reference's GEMM progression.

Reference ladder (SURVEY.md section 2.1, all CUDA):
  naive (naive_gemm.cu:38-57) -> SMEM-tiled (gemm_naive_tiled.cu:69-120) ->
  cp.async double-buffered (gemm_4_1_4_3.cu:166-236) -> WMMA tensor-core
  (tensorcore_gemm.cu:39-84) -> batched (gemm_4_8_batched.cu:38-95) ->
  fused epilogue ReLU(A@B+bias)+residual (gemm_fused_epilogue.cu:44-111,
  tensorcore_gemm_fused_epilogue.cu:53-130).

TPU mapping: WMMA 16x16 fragments -> MXU 128x128 tiles; SMEM tiles ->
VMEM BlockSpecs; the cp.async double-buffer -> Pallas' implicit multi-buffered
grid pipeline (the pipeline emitter overlaps the HBM->VMEM copy of block t+1
with compute on block t automatically — hand-rolled ping-pong buffers would
fight the compiler). The "naive" rung is plain jnp.dot: on TPU the XLA
baseline already tiles onto the MXU, so it is the meaningful baseline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_kernel_project_tpu.utils.platform import default_interpret


def _precision(dtype) -> jax.lax.Precision:
    """fp32 inputs get the full-fp32 ("HIGHEST") MXU decomposition — each
    operand split into bf16 hi+lo and SIX bf16 passes accumulated — so the
    fp32 rung is numerically fp32, like the reference's fp32 CUDA-core
    GEMMs. platform.tpu_peak_flops("fp32") divides the bf16 peak by 6 to
    match (advisor r2: pairing HIGHEST with a /3 denominator mis-scored
    every fp32 rung; the 3-pass Precision.HIGH path is NOT lowerable by
    Mosaic inside Pallas kernels — verified on-chip 2026-08-20:
    "NotImplementedError: Unsupported dot precision: HIGH"). bf16/int8
    inputs take the native fast path."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _pad_to(x: jax.Array, multiples: tuple[int, ...]) -> jax.Array:
    """Zero-pad trailing dims of x up to the given multiples."""
    pads = [(0, 0)] * (x.ndim - len(multiples))
    needs = False
    for dim, m in zip(x.shape[-len(multiples):], multiples):
        pad = (-dim) % m
        pads.append((0, pad))
        needs = needs or pad > 0
    return jnp.pad(x, pads) if needs else x


# ---------------------------------------------------------------------------
# Rung 0: naive / XLA baseline
# ---------------------------------------------------------------------------

@jax.jit
def matmul_xla(a: jax.Array, b: jax.Array) -> jax.Array:
    """Baseline GEMM: XLA's own MXU tiling (the reference's naive rung,
    naive_gemm.cu:38-57 — but on TPU "naive" already means compiler-tiled)."""
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32, precision=_precision(a.dtype)
    )


# ---------------------------------------------------------------------------
# Rungs 1-3: blocked Pallas GEMM (fp32 and bf16->fp32 MXU), K-pipelined
# ---------------------------------------------------------------------------

def _matmul_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:],
        b_ref[:],
        preferred_element_type=jnp.float32,
        precision=_precision(a_ref.dtype),
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret"),
)
def matmul(
    a: jax.Array,
    b: jax.Array,
    *,
    block_m: int | None = None,
    block_n: int = 1024,
    block_k: int = 512,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jax.Array:
    """Blocked Pallas GEMM, fp32 accumulation on the MXU.

    The VMEM BlockSpecs are the reference's SMEM tiles
    (gemm_naive_tiled.cu:69-120); the 3rd ("arbitrary") grid dim walks K with
    a revolving fp32 accumulator, and Pallas' pipeline emitter double-buffers
    the HBM->VMEM tile copies exactly like the reference's cp.async ping-pong
    (gemm_4_1_4_3.cu:174-231) — but correct by construction.
    """
    if interpret is None:
        interpret = default_interpret()
    if block_m is None:
        # fp32 tiles are 2x the bytes of bf16, and the HIGHEST-precision
        # 3-pass MXU decomposition adds its own scratch: (1024,1024) fp32
        # blocks hit 20M and (512,1024) still 16.2M vs the 16M scoped VMEM
        # limit, so the fp32 rung takes the quarter-size block.
        block_m = 512 if a.dtype.itemsize >= 4 else 1024
        if a.dtype.itemsize >= 4:
            block_n = min(block_n, 512)
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    a = _pad_to(a, (block_m, block_k))
    b = _pad_to(b, (block_k, block_n))
    mp, kp = a.shape
    np_ = b.shape[1]
    n_k = kp // block_k

    out = pl.pallas_call(
        functools.partial(_matmul_kernel, n_k=n_k),
        grid=(mp // block_m, np_ // block_n, n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_) * a.dtype.itemsize
            + mp * np_ * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b)
    return out[:m, :n]


def matmul_bf16(a, b, **kw):
    """MXU tensor-core rung (tensorcore_gemm.cu:39-84 analog):
    bf16 inputs, fp32 accumulation via preferred_element_type."""
    return matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), **kw)


# ---------------------------------------------------------------------------
# Rung 4: batched GEMM (leading grid dimension = batch)
# ---------------------------------------------------------------------------

def _batched_matmul_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[0],
        b_ref[0],
        preferred_element_type=jnp.float32,
        precision=_precision(a_ref.dtype),
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret"),
)
def batched_matmul(
    a: jax.Array,
    b: jax.Array,
    *,
    block_m: int | None = None,
    block_n: int = 1024,
    block_k: int = 512,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jax.Array:
    """Batched blocked GEMM: batch as leading parallel grid dim — the TPU
    analog of grid.z-batched launches (gemm_4_8_batched.cu:161-164,
    gemm_4_9_tensorcore_batched.cu:50-66)."""
    if interpret is None:
        interpret = default_interpret()
    if block_m is None:
        block_m = 512 if a.dtype.itemsize >= 4 else 1024  # see matmul
        if a.dtype.itemsize >= 4:
            block_n = min(block_n, 512)
    bsz, m, k = a.shape
    _, k2, n = b.shape
    assert k == k2
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    a = _pad_to(a, (block_m, block_k))
    b = _pad_to(b, (block_k, block_n))
    mp, kp = a.shape[1:]
    np_ = b.shape[2]
    n_k = kp // block_k

    out = pl.pallas_call(
        functools.partial(_batched_matmul_kernel, n_k=n_k),
        grid=(bsz, mp // block_m, np_ // block_n, n_k),
        in_specs=[
            pl.BlockSpec((1, block_m, block_k), lambda bb, i, j, kk: (bb, i, kk)),
            pl.BlockSpec((1, block_k, block_n), lambda bb, i, j, kk: (bb, kk, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_m, block_n), lambda bb, i, j, kk: (bb, i, j)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a, b)
    return out[:, :m, :n]


# ---------------------------------------------------------------------------
# Rung 5: fused epilogue — C = ReLU(A@B + bias) + residual
# ---------------------------------------------------------------------------

def _fused_epilogue_kernel(a_ref, b_ref, bias_ref, res_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:],
        b_ref[:],
        preferred_element_type=jnp.float32,
        precision=_precision(a_ref.dtype),
    )

    @pl.when(k == n_k - 1)
    def _():
        c = acc_ref[:] + bias_ref[:].astype(jnp.float32)
        c = jnp.maximum(c, 0.0) + res_ref[:].astype(jnp.float32)
        o_ref[:] = c.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret"),
)
def matmul_fused_epilogue(
    a: jax.Array,
    b: jax.Array,
    bias: jax.Array,
    residual: jax.Array,
    *,
    # smaller m-block than plain matmul: the residual block + bf16 out block
    # ride VMEM alongside the accumulator ((1024,1024) OOMs the 16M scoped
    # vmem limit at 20M)
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 512,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jax.Array:
    """C = ReLU(A@B + bias[col]) + residual, epilogue fused in-register on the
    final K step — the reference's fragment->smem->elementwise pattern
    (tensorcore_gemm_fused_epilogue.cu:91-128) collapses to VPU ops on the
    fp32 accumulator before the single HBM store."""
    if interpret is None:
        interpret = default_interpret()
    m, k = a.shape
    _, n = b.shape
    assert bias.shape == (n,) and residual.shape == (m, n)
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    a = _pad_to(a, (block_m, block_k))
    b = _pad_to(b, (block_k, block_n))
    bias2d = _pad_to(bias[None, :], (1, block_n))
    residual = _pad_to(residual, (block_m, block_n))
    mp, kp = a.shape
    np_ = b.shape[1]
    n_k = kp // block_k

    out = pl.pallas_call(
        functools.partial(_fused_epilogue_kernel, n_k=n_k),
        grid=(mp // block_m, np_ // block_n, n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
            pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a, b, bias2d, residual)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Rung 6: batched GEMM with fused scale+bias+softmax epilogue
# ---------------------------------------------------------------------------

def _batched_softmax_epilogue_kernel(
    a_ref, b_ref, bias_ref, o_ref, acc_ref, *, n_k, scale, n_valid, block_n
):
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[0],
        b_ref[0],
        preferred_element_type=jnp.float32,
        precision=_precision(a_ref.dtype),
    )

    @pl.when(k == n_k - 1)
    def _():
        # log2-domain epilogue (the attention ladder's discipline, r4):
        # log2(e) folds into scale/bias so exp is a bare exp2 — no
        # range-reduction multiply over the [block_m, N] tile
        log2e = 1.4426950408889634
        z = acc_ref[:] * (scale * log2e) + (
            bias_ref[:].astype(jnp.float32) * log2e
        )
        if n_valid < block_n:
            # zero-padded output columns must not join the row softmax
            col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
            z = jnp.where(col < n_valid, z, -jnp.inf)
        z = z - jnp.max(z, axis=-1, keepdims=True)
        # exp2 at the OUTPUT dtype: bf16 packs 2x on the VPU; z <= 0 after
        # max-subtraction keeps bf16 exp inside the 1e-2 numerics gate
        # (same argument as _fwd_kernel's exp-at-PV-precision)
        e = jnp.exp2(z.astype(o_ref.dtype))
        s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        inv = (1.0 / jnp.where(s == 0.0, 1.0, s)).astype(o_ref.dtype)
        o_ref[0] = e * inv


def _batched_softmax_epilogue_rows(
    a: jax.Array,
    b: jax.Array,
    bias: jax.Array,
    *,
    scale: float = 1.0,
    block_m: int = 512,
    block_k: int = 256,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jax.Array:
    """C[i] = softmax(scale * (A[i] @ B[i]) + bias[col], rows) — the batched
    tensor-core GEMM with the softmax fused into the epilogue (BASELINE.json
    config "tensorcore_gemm_batched with fused scale+bias+softmax epilogue";
    the reference's nearest rungs are the fused-epilogue GEMM
    tensorcore_gemm_fused_epilogue.cu:53-130 and the fused block-softmax
    attention flashattn_fused_softmax_block.cu:61-208, which also holds the
    whole score row on-chip).

    a: [B, M, K], b: [B, K, N], bias: [N]. The full output row (all N
    columns) lives in the fp32 VMEM accumulator so the row softmax runs
    in-register before the single HBM store — no score matrix round-trip.
    N is capped by VMEM (~block_m * N * 4 bytes); for streamed-KV softmax at
    unbounded N use flash_attention's online discipline instead.
    """
    if interpret is None:
        interpret = default_interpret()
    bsz, m, k = a.shape
    _, k2, n = b.shape
    assert k == k2 and bias.shape == (n,), (a.shape, b.shape, bias.shape)
    block_m = min(block_m, m)
    block_k = min(block_k, k)
    # scoped-VMEM clamp (r4 recalibration: the exp copy now lives at
    # out_dtype — see the kernel's log2-domain epilogue — so the budget
    # is acc f32 + e + 2x out buffers + the double-buffered b stream;
    # the r2-era formula assumed an f32 e and over-clamped block_m to
    # 256, which cost ~4% vs 512 at N=2048)
    esz = jnp.dtype(out_dtype).itemsize
    while block_m > 128 and (
        block_m * n * (4 + 3 * esz) + block_k * n * 4
    ) > (14 << 20):
        block_m //= 2
    a = _pad_to(a, (block_m, block_k))
    b = _pad_to(b, (block_k, 128))
    bias2d = _pad_to(bias[None, :], (1, 128))
    mp, kp = a.shape[1:]
    np_ = b.shape[2]
    n_k = kp // block_k

    out = pl.pallas_call(
        functools.partial(
            _batched_softmax_epilogue_kernel,
            n_k=n_k, scale=scale, n_valid=n, block_n=np_,
        ),
        grid=(bsz, mp // block_m, 1, n_k),
        in_specs=[
            pl.BlockSpec((1, block_m, block_k), lambda bb, i, j, kk: (bb, i, kk)),
            pl.BlockSpec((1, block_k, np_), lambda bb, i, j, kk: (bb, kk, 0)),
            pl.BlockSpec((1, np_), lambda bb, i, j, kk: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_m, np_), lambda bb, i, j, kk: (bb, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, np_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * mp * np_ * kp,
            bytes_accessed=(
                bsz * (mp * kp + kp * np_) * a.dtype.itemsize
                + bsz * mp * np_ * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=bsz * mp * np_,
        ),
        interpret=interpret,
    )(a, b, bias2d)
    return out[:, :m, :n]


# ---------------------------------------------------------------------------
# Rung 6b: A-resident fixed-max softmax epilogue (round 5, VERDICT r4 task 3)
# ---------------------------------------------------------------------------

def _batched_softmax_epilogue_resident_kernel(
    a_ref, b_ref, bias_ref, o_any, flag_ref, e_scr, l_scr, sem,
    *, n_n, n_m, n_b, block_m, block_n, scale, n_valid, m_valid,
):
    # The whole-N f32 row accumulator of the rows kernel capped block_m at
    # 512, re-streaming B per row block (4x at M=2048 — the measured gap,
    # docs/perf_journal.md r4 config-3 split). Here the K axis is NOT
    # blocked: each (b, i, j) program computes one FULL-K dot
    # [block_m, K] @ [K, block_n] with the A row-panel RESIDENT across the
    # whole j sweep, so A streams once and B streams M/block_m times with
    # block_m = 1024 — 32 MB/batch of traffic vs the rows kernel's 48.
    # No acc scratch exists at all; the softmax runs FIXED-MAX (m = 0,
    # exp2 straight off the log2-domain logits) into a whole-row VMEM e
    # buffer, normalized in place once l is complete, and stored by ONE
    # manual DMA per row panel. An l-range witness (the _fwd_kernel guard
    # contract) flags any row outside exp2's safe band; the wrapper
    # falls back to the always-correct rows kernel on breach.
    bb = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    log2e = 1.4426950408889634

    @pl.when(j == 0)
    def _():
        # e_scr is the SOURCE of the previous program's in-flight output
        # copy — it must land before this program's first panel store
        # overwrites the buffer. The copy got exactly one grid step of
        # flight (start at prev j==n_n-1, wait here); the ~4 MB store is
        # the price of whole-row residency without a second 4 MB buffer
        # (which would blow the 16 MB VMEM budget).
        @pl.when(bb * n_m + i > 0)
        def _():
            pltpu.make_async_copy(
                e_scr, o_any.at[0, pl.ds(0, block_m), :], sem
            ).wait()
        l_scr[:] = jnp.zeros_like(l_scr)

    def _panel(masked):
        z = jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(a_ref.dtype),
        )
        ze = z * (scale * log2e) + bias_ref[:].astype(jnp.float32) * log2e
        # exp2 at f32: WITHOUT max-subtraction the logits are not pinned
        # <= 0, and bf16-rounding a logit of magnitude ~12 costs ~3% on e
        # (the attention kernel's exp-at-output-dtype argument needs the
        # post-max z <= 0 bound, which fixed-max forgoes)
        e = jnp.exp2(ze)
        if masked:
            # zero-padded output columns must not join the row sums
            col = j * block_n + jax.lax.broadcasted_iota(
                jnp.int32, e.shape, 1
            )
            e = jnp.where(col < n_valid, e, 0)
        l_scr[:] = l_scr[:] + jnp.sum(
            e, axis=-1, keepdims=True, dtype=jnp.float32
        )
        e_scr[:, pl.ds(j * block_n, block_n)] = e.astype(e_scr.dtype)

    if n_valid % block_n:
        pl.when(j == n_n - 1)(lambda: _panel(True))
        pl.when(j < n_n - 1)(lambda: _panel(False))
    else:
        _panel(False)

    @pl.when(j == n_n - 1)
    def _finish():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        e_scr[:] = e_scr[:] * (1.0 / safe_l).astype(e_scr.dtype)
        # l-range witness (the fixed-max guard contract, _fwd_kernel): l in
        # [2^-100, 2^120] certifies every row's exp2 stayed in-range with
        # summation headroom; rows past m_valid are padding (A rows are
        # zero there -> finite l, never flagged spuriously, sliced off).
        row = i * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (block_m, 1), 0
        )
        real = row < m_valid
        bad = jnp.logical_or(
            jnp.logical_not(jnp.isfinite(l)),
            jnp.logical_or(l > 2.0 ** 120, l < 2.0 ** -100),
        )
        cnt = jnp.sum(jnp.logical_and(bad, real).astype(jnp.float32))
        flag_ref[0] = jnp.full(flag_ref.shape[1:], cnt, jnp.float32)

        # Manual store of the finished row panel; the matching wait is at
        # the NEXT program's j == 0 (see _init) — or right here for the
        # final program, whose copy nobody else will drain.
        cp = pltpu.make_async_copy(
            e_scr,
            o_any.at[bb, pl.ds(i * block_m, block_m), :],
            sem,
        )
        cp.start()

        @pl.when(bb * n_m + i == n_b * n_m - 1)
        def _():
            cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_m", "block_k", "out_dtype", "interpret",
                     "resident"),
)
def batched_matmul_softmax_epilogue(
    a: jax.Array,
    b: jax.Array,
    bias: jax.Array,
    *,
    scale: float = 1.0,
    block_m: int = 512,
    block_k: int = 256,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
    resident: bool | None = None,
) -> jax.Array:
    """C[i] = softmax(scale * (A[i] @ B[i]) + bias[col], rows) — the batched
    tensor-core GEMM with the softmax fused into the epilogue (BASELINE.json
    config "tensorcore_gemm_batched with fused scale+bias+softmax epilogue";
    reference analogs: tensorcore_gemm_fused_epilogue.cu:53-130 and
    flashattn_fused_softmax_block.cu:61-208).

    Two structures (VERDICT r4 task 3 / round-5 restructure):
      resident (default when it fits): A row-panels resident across a
        full-K j-sweep, fixed-max exp2 into a whole-row VMEM buffer,
        in-place normalize, one manual DMA per panel — block_m 1024, B
        re-streamed only M/1024 times. Unconditionally correct via the
        l-range witness: any row outside exp2's safe band flips a flag
        and the call falls back to the rows kernel below.
      rows: whole-N f32 row accumulator + online max (always correct,
        any input) — the fallback and the non-fitting-shape path.
    """
    if interpret is None:
        interpret = default_interpret()
    bsz, m, k = a.shape
    _, k2, n = b.shape
    assert k == k2 and bias.shape == (n,), (a.shape, b.shape, bias.shape)
    esz = jnp.dtype(out_dtype).itemsize

    rows_fn = functools.partial(
        _batched_softmax_epilogue_rows,
        scale=scale, block_m=block_m, block_k=block_k,
        out_dtype=out_dtype, interpret=interpret,
    )
    if resident is None:
        # Default: the ROWS structure. The resident form was built and
        # MEASURED in round 5 (canonical shape, device-trace): 100.2 TF
        # (0.509x) at its only compiling width bn=128, vs the rows
        # kernel's 122.0 (0.619); bn=256 blows scoped VMEM (A panels 8 MB
        # + e row buffer 4.2 MB leave no room). The decisive probe: the
        # EPILOGUE-FREE batched matmul at this 32x2048^3 shape maxes at
        # 0.69x across 8 block configs (whole-K bn128 reads 0.665, the
        # k-gridded bn128 0.352 — narrow-N is only viable with whole-K
        # contraction, which is exactly what forces the VMEM-impossible
        # residency). docs/perf_journal.md round 5 has the full table.
        resident = False
    if not resident:
        return rows_fn(a, b, bias)

    bm, bn = 1024, 128
    ap = _pad_to(a, (bm, 128))
    bp = _pad_to(b, (128, bn))
    bias2d = _pad_to(bias[None, :], (1, bn))
    mp, kp = ap.shape[1:]
    np_ = bp.shape[2]
    n_m, n_n = mp // bm, np_ // bn

    out, flag = pl.pallas_call(
        functools.partial(
            _batched_softmax_epilogue_resident_kernel,
            n_n=n_n, n_m=n_m, n_b=bsz, block_m=bm, block_n=bn,
            scale=scale, n_valid=n, m_valid=m,
        ),
        grid=(bsz, n_m, n_n),
        in_specs=[
            pl.BlockSpec((1, bm, kp), lambda bb, i, j: (bb, i, 0)),
            pl.BlockSpec((1, kp, bn), lambda bb, i, j: (bb, 0, j)),
            pl.BlockSpec((1, bn), lambda bb, i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 8, 128), lambda bb, i, j: (bb, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, mp, np_), out_dtype),
            jax.ShapeDtypeStruct((bsz, n_m * 8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, np_), out_dtype),
            pltpu.VMEM((bm, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=int(16.5 * (1 << 20)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * mp * np_ * kp,
            bytes_accessed=(
                bsz * (mp * kp + 2 * kp * np_) * a.dtype.itemsize
                + bsz * mp * np_ * esz
            ),
            transcendentals=bsz * mp * np_,
        ),
        interpret=interpret,
    )(ap, bp, bias2d)
    bad = flag[:, ::8, 0].sum()
    return jax.lax.cond(
        bad > 0,
        lambda: rows_fn(a, b, bias),
        lambda: out[:, :m, :n],
    )
