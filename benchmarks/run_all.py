#!/usr/bin/env python
"""Benchmark suite: the whole kernel ladder vs the chip roofline.

The TPU-native analog of running every reference binary in sequence — each
rung reports TFLOP/s (and GB/s where bandwidth-bound) plus its roofline
fraction, using overhead-free chained timing (see utils.benchmarking).

Usage:  python benchmarks/run_all.py [--quick] [--only SUBSTR]
Writes benchmarks/results.json and prints a table. Each rung costs two
remote compiles (~1-3 min each on the axon tunnel) — budget ~20 min for the
full suite.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_benches(quick: bool, long: bool = False):
    import jax.numpy as jnp
    from flashattention_kernel_project_tpu import ops
    from flashattention_kernel_project_tpu.utils.benchmarking import benchmark_chained

    rng = np.random.default_rng(42)
    n_pair = (4, 16) if quick else (20, 120)
    benches = []

    def reg(name, fn, args, flops=None, bytes_accessed=None, chain=None,
            dtype="bf16", pair=None):
        benches.append(
            dict(name=name, fn=fn, args=args, flops=flops,
                 bytes_accessed=bytes_accessed, chain=chain, dtype=dtype,
                 n_pair=pair or n_pair)
        )

    # --- GEMM ladder (reference section 2.1) -------------------------------
    m = 4096
    a16 = jnp.asarray(rng.standard_normal((m, m)), dtype=jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((m, m)), dtype=jnp.bfloat16)
    reg("gemm_xla_bf16_4096", ops.matmul_xla, (a16, b16),
        flops=2 * m**3,
        chain=lambda out, args: (out.astype(jnp.bfloat16), args[1]))
    reg("gemm_pallas_bf16_4096",
        functools.partial(ops.matmul, out_dtype=jnp.bfloat16),
        (a16, b16), flops=2 * m**3)

    m32 = 2048
    a32 = jnp.asarray(rng.standard_normal((m32, m32)), dtype=jnp.float32)
    b32 = jnp.asarray(rng.standard_normal((m32, m32)), dtype=jnp.float32)
    reg("gemm_pallas_fp32_2048", ops.matmul, (a32, b32), flops=2 * m32**3,
        dtype="fp32")

    bb, mb = 8, 1024
    ab = jnp.asarray(rng.standard_normal((bb, mb, mb)), dtype=jnp.bfloat16)
    bbm = jnp.asarray(rng.standard_normal((bb, mb, mb)), dtype=jnp.bfloat16)
    reg("gemm_batched_bf16_8x1024",
        functools.partial(ops.batched_matmul, out_dtype=jnp.bfloat16),
        (ab, bbm), flops=2 * bb * mb**3)

    bias = jnp.asarray(rng.standard_normal(m), dtype=jnp.float32)
    resid = jnp.asarray(rng.standard_normal((m, m)), dtype=jnp.float32)
    reg("gemm_fused_epilogue_bf16_4096",
        functools.partial(ops.matmul_fused_epilogue, out_dtype=jnp.bfloat16),
        (a16, b16, bias, resid), flops=2 * m**3)

    w8, w8s = ops.quantize_int8(
        jnp.asarray(rng.standard_normal((m, m)), jnp.float32), axis=0)
    reg("gemm_int8_weights_4096",
        functools.partial(ops.matmul_int8_weights, out_dtype=jnp.bfloat16),
        (a16, w8, w8s), flops=2 * m**3)

    wf8, wf8s = ops.quantize_fp8_weights(
        jnp.asarray(rng.standard_normal((m, m)), jnp.float32))
    reg("gemm_fp8_weights_4096",
        functools.partial(ops.matmul_fp8_weights, out_dtype=jnp.bfloat16),
        (a16, wf8, wf8s), flops=2 * m**3)

    # fully-quantized GEMM: both operands int8 on the MXU — judged against
    # the int8 roofline (v5e: 394 TOPS, 2x bf16). Exact int32 accumulate,
    # dequant epilogue.
    a8, a8s = ops.quantize_int8(
        jnp.asarray(rng.standard_normal((m, m)), jnp.float32), axis=1)
    # chain: the bf16 output feeds back as the int8 activation (saturating
    # cast — values are garbage but the data dependence serializes
    # iterations; the default identity chain tripped the fori_loop carry
    # dtype check: bf16 out vs int8 in)
    reg("gemm_int8_int8_4096", ops.matmul_int8, (a8, a8s, w8, w8s),
        flops=2 * m**3, dtype="int8",
        chain=lambda out, args: (
            jnp.clip(out, -127, 127).astype(jnp.int8),
        ) + tuple(args[1:]))

    # BASELINE.json config: "tensorcore_gemm_batched with fused
    # scale+bias+softmax epilogue (B=32, M=N=K=2048)"
    bs, ms = 32, 2048
    a_sm = jnp.asarray(rng.standard_normal((bs, ms, ms)), dtype=jnp.bfloat16)
    b_sm = jnp.asarray(rng.standard_normal((bs, ms, ms)), dtype=jnp.bfloat16)
    bias_sm = jnp.asarray(rng.standard_normal(ms), dtype=jnp.float32)
    reg("gemm_batched_softmax_epilogue_bf16_32x2048",
        functools.partial(
            ops.batched_matmul_softmax_epilogue,
            scale=0.125, out_dtype=jnp.bfloat16,
        ),
        (a_sm, b_sm, bias_sm), flops=2 * bs * ms**3,
        chain=lambda out, args: (args[0], out.swapaxes(1, 2), args[2]))
    # the round-5 A-resident fixed-max structure, kept as a measured
    # research branch (see gemm.py's resident note + the r5 journal:
    # 0.509x vs rows' 0.617 — the narrow-N whole-K dots it needs cap at
    # 0.665 and wider panels blow scoped VMEM)
    reg("gemm_batched_softmax_epilogue_resident",
        functools.partial(
            ops.batched_matmul_softmax_epilogue,
            scale=0.125, out_dtype=jnp.bfloat16, resident=True,
        ),
        (a_sm, b_sm, bias_sm), flops=2 * bs * ms**3,
        chain=lambda out, args: (args[0], out.swapaxes(1, 2), args[2]))
    # config-3 probe split (VERDICT r4 task 6): (a) plain batched matmul
    # at the same shape — the epilogue-free cost of the SAME problem
    # (its own block shapes, not the fused kernel's N-wide-row constraint);
    # (b) the fusion-win baseline — batched matmul + XLA row softmax
    import jax as _jx

    reg("gemm_batched_softmax_unfused_baseline",
        # scores round-trip HBM as bf16 (the f32 round trip OOMs the
        # batched kernel's VMEM at 2048-wide blocks); softmax itself
        # computes in f32 — a fair perf baseline for the fusion win
        lambda a, b_, bias: _jx.nn.softmax(
            ops.batched_matmul(a, b_, out_dtype=jnp.bfloat16)
            .astype(jnp.float32) * 0.125 + bias[None, None, :],
            axis=-1,
        ).astype(jnp.bfloat16),
        (a_sm, b_sm, bias_sm), flops=2 * bs * ms**3,
        chain=lambda out, args: (args[0], out.swapaxes(1, 2), args[2]))

    # --- softmax (reference section 2.2) -----------------------------------
    rows, cols = 8192, 4096
    x = jnp.asarray(rng.standard_normal((rows, cols)), dtype=jnp.float32)
    reg("softmax_8192x4096", ops.softmax, (x,),
        bytes_accessed=2 * rows * cols * 4, flops=5 * rows * cols)
    # the reference's own softmax config (4096 rows x 512,
    # softmax_naive_baseline.cu / softmax_block_hybrid.cu mains). NOTE: the
    # whole 8.4 MB problem fits in VMEM, so the chained-loop carry stays
    # on-chip and the measured "GB/s" is VMEM-resident throughput (2.3 TB/s
    # measured) — the reference's benchmark size is simply small for a TPU.
    rows_r, cols_r = 4096, 512
    xr = jnp.asarray(rng.standard_normal((rows_r, cols_r)), dtype=jnp.float32)
    reg("softmax_4096x512_refcfg", ops.softmax, (xr,),
        bytes_accessed=2 * rows_r * cols_r * 4, flops=5 * rows_r * cols_r)
    # copy-only 50%-write stream at the softmax shape (VERDICT r4 task 4b):
    # measures whether the softmax rung's ~323 GB/s wall is the machine's
    # balanced-stream plateau or the kernel's
    from flashattention_kernel_project_tpu.ops import probes as _probes

    reg("probe_stream_copy_8192x4096_f32", _probes.stream_copy_probe, (x,),
        bytes_accessed=2 * rows * cols * 4, flops=rows * cols)

    # --- fused attention (sections 2.3-2.5) --------------------------------
    B, H, HKV, N, D = 1, 16, 4, 4096, 128

    # interface-bytes accounting for the attention rows (VERDICT r4 task 9:
    # the reference's memprofile prints TFLOPS AND GB/s,
    # flashattn_forward_wmma_memprofile.cu:409-411): q + k + v in, out +
    # lse out; the backward adds g/o/lse in and dq/dk/dv out. Internal
    # recompute/partials traffic is NOT counted — this is the achieved
    # interface bandwidth, the memprofile convention.
    def attn_bytes(b_, h_, hkv_, n_, d_, bwd=False):
        qo = b_ * h_ * n_ * d_ * 2
        kv = 2 * b_ * hkv_ * n_ * d_ * 2
        lse = b_ * h_ * n_ * 4
        fwd_b = qo + kv + qo + lse
        if not bwd:
            return fwd_b
        # in: q, k, v, o, g, lse; out: dq, dk, dv
        return 3 * qo + 2 * kv + lse + qo
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, HKV, N, D)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, HKV, N, D)), dtype=jnp.bfloat16)
    reg("flashattn_fwd_causal_d128_seq4k",
        functools.partial(ops.flash_attention, causal=True),
        (q, k, v), flops=int(4 * B * H * N * N * D * 0.5),
        bytes_accessed=attn_bytes(B, H, HKV, N, D))
    reg("flashattn_fwd_full_d128_seq4k",
        functools.partial(ops.flash_attention, causal=False),
        (q, k, v), flops=4 * B * H * N * N * D,
        bytes_accessed=attn_bytes(B, H, HKV, N, D))
    # fixed-max discipline (stable=False): bounded-logit serving fast path
    reg("flashattn_fwd_causal_d128_seq4k_fast",
        functools.partial(ops.flash_attention, causal=True, stable=False),
        (q, k, v), flops=int(4 * B * H * N * N * D * 0.5),
        bytes_accessed=attn_bytes(B, H, HKV, N, D))
    reg("flashattn_fwd_full_d128_seq4k_fast",
        functools.partial(ops.flash_attention, causal=False, stable=False),
        (q, k, v), flops=4 * B * H * N * N * D,
        bytes_accessed=attn_bytes(B, H, HKV, N, D))
    # hybrid per-q-block discipline (stable="auto"): unconditionally
    # correct on any input — the caveat-free headline discipline
    reg("flashattn_fwd_causal_d128_seq4k_auto",
        functools.partial(ops.flash_attention, causal=True, stable="auto"),
        (q, k, v), flops=int(4 * B * H * N * N * D * 0.5),
        bytes_accessed=attn_bytes(B, H, HKV, N, D))
    # auto with the cacheable k-norm scalar precomputed (k_max_norm):
    # the per-(K, layer) caching mode a serving/training stack uses —
    # skips only the k-half norm pass, never a correctness check
    reg("flashattn_fwd_causal_d128_seq4k_auto_kmax",
        functools.partial(ops.flash_attention, causal=True, stable="auto",
                          k_max=ops.k_max_norm(k)),
        (q, k, v), flops=int(4 * B * H * N * N * D * 0.5),
        bytes_accessed=attn_bytes(B, H, HKV, N, D))

    # BASELINE.md tracks attention-fwd vs roofline at d in {64,128} and
    # seq 4K-32K — the long-seq sweep (--long: the chained timing programs
    # at 8K+ take minutes to remote-compile) and the d=64 point:
    for seq_k in ((8, 16, 32) if long else ()):
        Nl = seq_k * 1024
        ql = jnp.asarray(rng.standard_normal((B, H, Nl, D)), jnp.bfloat16)
        kl = jnp.asarray(rng.standard_normal((B, HKV, Nl, D)), jnp.bfloat16)
        vl = jnp.asarray(rng.standard_normal((B, HKV, Nl, D)), jnp.bfloat16)
        reg(f"flashattn_fwd_causal_d128_seq{seq_k}k",
            functools.partial(ops.flash_attention, causal=True),
            (ql, kl, vl), flops=int(4 * B * H * Nl * Nl * D * 0.5),
            bytes_accessed=attn_bytes(B, H, HKV, Nl, D))
        reg(f"flashattn_fwd_causal_d128_seq{seq_k}k_fast",
            functools.partial(ops.flash_attention, causal=True, stable=False),
            (ql, kl, vl), flops=int(4 * B * H * Nl * Nl * D * 0.5),
            bytes_accessed=attn_bytes(B, H, HKV, Nl, D))
        reg(f"flashattn_fwd_causal_d128_seq{seq_k}k_auto",
            functools.partial(ops.flash_attention, causal=True,
                              stable="auto"),
            (ql, kl, vl), flops=int(4 * B * H * Nl * Nl * D * 0.5),
            bytes_accessed=attn_bytes(B, H, HKV, Nl, D))
        if seq_k == 32:
            # sliding-window at 32K/window-4K: the O(N*W) grid skip in
            # action — useful FLOPs count only in-window pairs
            W = 4096
            pairs = Nl * W - (W * (W - 1)) // 2
            reg("flashattn_fwd_causal_d128_seq32k_win4k_fast",
                functools.partial(ops.flash_attention, causal=True,
                                  stable=False, window=W),
                (ql, kl, vl), flops=4 * B * H * pairs * D,
                bytes_accessed=attn_bytes(B, H, HKV, Nl, D))
            # + StreamingLLM sinks: useful pairs add the sink columns
            # visible below the band (the narrow sink-step instantiation,
            # VERDICT r4 task 9)
            SK = 64
            pairs_s = pairs + SK * (Nl - W)
            reg("flashattn_fwd_causal_d128_seq32k_win4k_sinks64_fast",
                functools.partial(ops.flash_attention, causal=True,
                                  stable=False, window=W, sinks=SK),
                (ql, kl, vl), flops=4 * B * H * pairs_s * D,
                bytes_accessed=attn_bytes(B, H, HKV, Nl, D))
    # Backward pass. ROUND-4 CORRECTION: the r1-r3 rung's chain consumed
    # only dq, so XLA dead-code-eliminated the dkdv kernel inside the
    # timed loop — the recorded 111-124 TF "bwd" numbers measured
    # fwd + dq-kernel only (docs/perf_journal.md r4). Every chain below
    # couples ALL returned grads into the carry (data-dependent 1e-20
    # terms XLA cannot fold) so nothing is elided.
    import jax as _jax
    from flashattention_kernel_project_tpu.ops.flash_attention import (
        _bwd_pallas as _bwdp,
    )

    def _couple(main, *rest):
        x = main.astype(jnp.float32)
        for r in rest:
            x = x + r.astype(jnp.float32).mean() * 1e-20
        return x.astype(jnp.bfloat16)

    def _fa_grads(q_, k_, v_):
        f = lambda a, b, c: ops.flash_attention(  # noqa: E731
            a, b, c, causal=True, stable="auto"
        ).astype(jnp.float32).sum()
        return _jax.grad(f, argnums=(0, 1, 2))(q_, k_, v_)

    def _bwd_res(q_, k_, v_, seqk):
        o_, l_ = ops.flash_attention_with_lse(q_, k_, v_, causal=True)
        _jax.block_until_ready(o_)
        return (q_, k_, v_, o_, l_)

    # bwd-only rung: the VJP given saved residuals — 5 matmul units
    # (s + dp recompute, dv, dk, dq), all executed AND all useful in the
    # fused kernel (no 5/7 recompute waste; VERDICT r4 task 2).
    # Residuals are CLOSURE captures (program constants) up to 16K:
    # passing them as chained args costs ~11% of pass-through carry
    # copies in the timing loop (4K measured 119.4 TF captured vs 107.9
    # as args — same kernel). At 32K the captured constants blow the
    # remote-compile request size (HTTP 413), so only that rung pays the
    # args form, noted in the journal.
    res4 = _bwd_res(q, k, v, 4)
    smr = 1.0 / float(np.sqrt(D))

    def _bwd_only(g_, q_, k_, v_, o_, l_):
        return _bwdp((q_, k_, v_, o_, l_), g_, True, smr, 0, None, None,
                     None)

    def _bwd_chain(out, args):
        return (_couple(out[0], out[1], out[2]),) + tuple(args[1:])

    def _bwd_only_cap(g_, res=res4):
        return _bwdp(res, g_, True, smr, 0, None, None, None)

    reg("flashattn_bwd_causal_d128_seq4k", _bwd_only_cap, (q,),
        flops=int(10 * B * H * N * N * D * 0.5),
        bytes_accessed=attn_bytes(B, H, HKV, N, D, bwd=True),
        chain=lambda out, args: (_couple(out[0], out[1], out[2]),))

    # non-causal bwd (round 5): the fused kernel with no diagonal at all —
    # the number that isolated the causal gap as dead work (r4 probe read
    # 0.890); a canonical row pins it
    def _bwd_res_f(q_, k_, v_):
        o_, l_ = ops.flash_attention_with_lse(q_, k_, v_, causal=False)
        _jax.block_until_ready(o_)
        return (q_, k_, v_, o_, l_)

    res4f = _bwd_res_f(q, k, v)

    def _bwd_full_cap(g_, res=res4f):
        return _bwdp(res, g_, False, smr, 0, None, None, None)

    reg("flashattn_bwd_full_d128_seq4k", _bwd_full_cap, (q,),
        flops=int(10 * B * H * N * N * D),
        bytes_accessed=attn_bytes(B, H, HKV, N, D, bwd=True),
        chain=lambda out, args: (_couple(out[0], out[1], out[2]),))
    # grad rung (training step shape): fwd + bwd in one call; useful = 7
    # units (2 fwd + 5 bwd), causal-halved
    reg("flashattn_grad_causal_d128_seq4k", _fa_grads, (q, k, v),
        flops=int(14 * B * H * N * N * D * 0.5),
        bytes_accessed=attn_bytes(B, H, HKV, N, D, bwd=True),
        chain=lambda out, args: (_couple(out[0], out[1], out[2]), args[1],
                                 args[2]))
    # bwd at 8K (fused form's gate boundary) and the 16/32K two-kernel
    # form (n_kv > 8 -> partials traffic would dominate; VERDICT r4)
    for seq_k in ((8, 16, 32) if long else ()):
        Nl = seq_k * 1024
        qb = jnp.asarray(rng.standard_normal((B, H, Nl, D)), jnp.bfloat16)
        kb = jnp.asarray(rng.standard_normal((B, HKV, Nl, D)), jnp.bfloat16)
        vb = jnp.asarray(rng.standard_normal((B, HKV, Nl, D)), jnp.bfloat16)
        resl = _bwd_res(qb, kb, vb, seq_k)
        if seq_k <= 16:
            def _bwd_l(g_, res=resl):
                return _bwdp(res, g_, True, smr, 0, None, None, None)

            reg(f"flashattn_bwd_causal_d128_seq{seq_k}k", _bwd_l, (qb,),
                flops=int(10 * B * H * Nl * Nl * D * 0.5),
                bytes_accessed=attn_bytes(B, H, HKV, Nl, D, bwd=True),
                chain=lambda out, args: (
                    _couple(out[0], out[1], out[2]),
                ),
                pair=(2, 6) if quick else (4, 12))
        else:
            reg(f"flashattn_bwd_causal_d128_seq{seq_k}k", _bwd_only,
                (qb,) + resl,
                flops=int(10 * B * H * Nl * Nl * D * 0.5),
                bytes_accessed=attn_bytes(B, H, HKV, Nl, D, bwd=True),
                chain=_bwd_chain,
                pair=(2, 6) if quick else (4, 12))

    D64 = 64
    q64 = jnp.asarray(rng.standard_normal((B, H, N, D64)), jnp.bfloat16)
    k64 = jnp.asarray(rng.standard_normal((B, HKV, N, D64)), jnp.bfloat16)
    v64 = jnp.asarray(rng.standard_normal((B, HKV, N, D64)), jnp.bfloat16)
    reg("flashattn_fwd_causal_d64_seq4k",
        functools.partial(ops.flash_attention, causal=True),
        (q64, k64, v64), flops=int(4 * B * H * N * N * D64 * 0.5),
        bytes_accessed=attn_bytes(B, H, HKV, N, D64))
    # d64 fixed-max: the KV-head-paired kernel (_fwd_kernel_packed) with
    # MXU-computed softmax sums — see perf_journal r3 for the measured
    # 0.50x structural MXU floor at this head dim
    reg("flashattn_fwd_causal_d64_seq4k_fast",
        functools.partial(ops.flash_attention, causal=True, stable=False),
        (q64, k64, v64), flops=int(4 * B * H * N * N * D64 * 0.5),
        bytes_accessed=attn_bytes(B, H, HKV, N, D64))
    # d64 unconditionally-correct hybrid (VERDICT r4 task 8): routes
    # through the UNPACKED hybrid kernel — r3 measured head pairing worth
    # ~1% over unpacked fast at d64, so auto forgoes it
    reg("flashattn_fwd_causal_d64_seq4k_auto",
        functools.partial(ops.flash_attention, causal=True, stable="auto"),
        (q64, k64, v64), flops=int(4 * B * H * N * N * D64 * 0.5),
        bytes_accessed=attn_bytes(B, H, HKV, N, D64))
    # d64 pure-MXU probes (VERDICT r4 task 4a): validate the claimed 0.50x
    # structural MXU ceiling at d=64 by measuring the bare QK/PV dots at
    # this head dim (the d128 versions measured 0.82x+ in r2)
    reg("probe_qk_d64_seq4k", _probes.qk_probe, (q64, k64, v64),
        flops=int(2 * B * H * N * N * D64),
        chain=lambda out, args: (out.astype(jnp.bfloat16), args[1], args[2]))
    reg("probe_pv_d64_seq4k", _probes.pv_probe, (q64, k64, v64),
        flops=int(2 * B * H * N * N * D64),
        chain=lambda out, args: (out.astype(jnp.bfloat16), args[1], args[2]))
    # bare QK at the PACKED d64 shape (VERDICT r4 task 5): contraction-128
    # block-diagonal operands on _fwd_kernel_packed's exact grid — the
    # envelope the packed fused kernel (0.349x) must be judged against.
    # Useful flops = the unpacked QK count (half the packed dot's MACs are
    # the deliberate zero quadrants), so the fraction is directly
    # comparable to probe_qk_d64_seq4k.
    reg("probe_qk_d64_packed_seq4k", _probes.qk_packed_probe, (q64, k64),
        flops=int(2 * B * H * N * N * D64),
        # out [b, pairs, group, n, 2d] -> unpack the two lane-halves back
        # into a [b, h, n, d] bf16 q for the next iteration (data-dependent
        # carry, shape-exact)
        chain=lambda out, args: (
            jnp.concatenate(
                [out[..., :D64], out[..., D64:]], axis=2
            ).reshape(args[0].shape).astype(jnp.bfloat16),
            args[1],
        ))

    # KV-quantized prefill (fused in-kernel dequant): 4K point, plus the
    # BASELINE config-5 shape (GQA 32/8 heads, d=128, seq 32K, INT8 KV)
    # under --long. chain: q <- out (cache operands stay int8).
    kq4, ks4, vq4, vs4 = ops.quantize_kv(k, v)
    reg("flashattn_fwd_causal_d128_seq4k_kvq_int8",
        functools.partial(ops.flash_attention_kv_quant, causal=True,
                          stable=False),
        (q, kq4, ks4, vq4, vs4), flops=int(4 * B * H * N * N * D * 0.5),
        chain=lambda out, args: (out,) + tuple(args[1:]))
    # the quant path's caveat-free hybrid (the bound covers the
    # DEQUANTIZED keys via the per-token scales — see _fwd's kmax)
    reg("flashattn_fwd_causal_d128_seq4k_kvq_int8_auto",
        functools.partial(ops.flash_attention_kv_quant, causal=True,
                          stable="auto"),
        (q, kq4, ks4, vq4, vs4), flops=int(4 * B * H * N * N * D * 0.5),
        chain=lambda out, args: (out,) + tuple(args[1:]))
    if long:
        H5, HKV5, N5 = 32, 8, 32768
        q5 = jnp.asarray(rng.standard_normal((1, H5, N5, D)), jnp.bfloat16)
        k5 = jnp.asarray(rng.standard_normal((1, HKV5, N5, D)), jnp.bfloat16)
        v5 = jnp.asarray(rng.standard_normal((1, HKV5, N5, D)), jnp.bfloat16)
        kq5, ks5, vq5, vs5 = ops.quantize_kv(k5, v5)
        reg("flashattn_fwd_causal_d128_seq32k_gqa32-8_kvq_int8",
            functools.partial(ops.flash_attention_kv_quant, causal=True,
                              stable=False),
            (q5, kq5, ks5, vq5, vs5),
            flops=int(4 * 1 * H5 * N5 * N5 * D * 0.5),
            pair=(2, 6) if quick else (4, 12))

    # --- decode (streaming section 2.6 analog; bandwidth-bound) ------------
    DB, DS = 8, 8192
    qd = jnp.asarray(rng.standard_normal((DB, H, D)), dtype=jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((DB, HKV, DS, D)), dtype=jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((DB, HKV, DS, D)), dtype=jnp.bfloat16)
    lens = jnp.full((DB,), DS, jnp.int32)
    kv_bytes = 2 * DB * HKV * DS * D * 2
    reg("flash_decode_bf16_b8_s8192",
        ops.flash_decode,
        (qd, kc, vc, lens), bytes_accessed=kv_bytes,
        flops=4 * DB * H * DS * D)
    kq, ks, vq, vs = ops.quantize_kv(kc, vc)
    reg("flash_decode_int8_b8_s8192",
        ops.flash_decode_int8,
        (qd, kq, ks, vq, vs, lens), bytes_accessed=kv_bytes // 2,
        flops=4 * DB * H * DS * D)

    # paged decode (vLLM-style block tables), bf16 + int8 pools: same
    # problem as the linear decode above, KV scattered into 128-token pages
    page, n_pages = 128, DB * (DS // 128) + 1
    max_pages = DS // 128
    kp = jnp.concatenate([
        jnp.zeros((1, HKV, page, D), kc.dtype),  # reserved junk page 0
        kc.transpose(0, 2, 1, 3).reshape(DB, max_pages, page, HKV, D)
          .transpose(0, 1, 3, 2, 4).reshape(DB * max_pages, HKV, page, D),
    ])
    vp = jnp.concatenate([
        jnp.zeros((1, HKV, page, D), vc.dtype),
        vc.transpose(0, 2, 1, 3).reshape(DB, max_pages, page, HKV, D)
          .transpose(0, 1, 3, 2, 4).reshape(DB * max_pages, HKV, page, D),
    ])
    tables = jnp.asarray(
        1 + np.arange(DB * max_pages, dtype=np.int32).reshape(DB, max_pages)
    )
    reg("paged_decode_bf16_b8_s8192",
        ops.paged_flash_decode,
        (qd, kp, vp, tables, lens), bytes_accessed=kv_bytes,
        flops=4 * DB * H * DS * D)
    ksp = jnp.concatenate([
        jnp.zeros((1, HKV, 1, page), jnp.float32),
        ks.reshape(DB, HKV, max_pages, 1, page).transpose(0, 2, 1, 3, 4)
          .reshape(DB * max_pages, HKV, 1, page),
    ])
    vsp = jnp.concatenate([
        jnp.zeros((1, HKV, 1, page), jnp.float32),
        vs.reshape(DB, HKV, max_pages, 1, page).transpose(0, 2, 1, 3, 4)
          .reshape(DB * max_pages, HKV, 1, page),
    ])
    kp8 = jnp.concatenate([
        jnp.zeros((1, HKV, page, D), kq.dtype),
        kq.transpose(0, 2, 1, 3).reshape(DB, max_pages, page, HKV, D)
          .transpose(0, 1, 3, 2, 4).reshape(DB * max_pages, HKV, page, D),
    ])
    vp8 = jnp.concatenate([
        jnp.zeros((1, HKV, page, D), vq.dtype),
        vq.transpose(0, 2, 1, 3).reshape(DB, max_pages, page, HKV, D)
          .transpose(0, 1, 3, 2, 4).reshape(DB * max_pages, HKV, page, D),
    ])
    reg("paged_decode_int8_b8_s8192",
        ops.paged_flash_decode_quant,
        (qd, kp8, ksp, vp8, vsp, tables, lens),
        bytes_accessed=kv_bytes // 2, flops=4 * DB * H * DS * D)
    # opt-in q-int8 variant (round 5): per-row int8 q -> pure int8 MXU QK
    # dot, no K dequant cast. +0.02x of roofline for ~2x output error vs
    # the dequant oracle — measured, recorded, default OFF (see
    # paged_flash_decode_quant's q_int8 note).
    reg("paged_decode_int8_qint8_b8_s8192",
        functools.partial(ops.paged_flash_decode_quant, q_int8=True),
        (qd, kp8, ksp, vp8, vsp, tables, lens),
        bytes_accessed=kv_bytes // 2, flops=4 * DB * H * DS * D)

    # explicit-DMA double-buffer pipeline (section 2.7 warp-specialization
    # analog) at an HBM-RESIDENT shape (512 MB KV): the reference's own
    # B=1024/S=128 config fits in v5e's ~128 MB VMEM, where a plain XLA
    # loop holds the whole cache on-chip and reads 14x the HBM roofline —
    # meaningless as a streaming benchmark (measured 2026-08-19; see
    # perf_journal). seq_chunk=8 folds 8 sequences per program: one wide
    # DMA per tile, program count /8 (0.061x -> 0.814x roofline).
    SB, SH, SS, SD = 256, 8, 4096, 128
    qs = jnp.asarray(rng.standard_normal((SB, SH, SD)), dtype=jnp.bfloat16)
    ks_c = jnp.asarray(rng.standard_normal((SB, 1, SS, SD)), dtype=jnp.bfloat16)
    vs_c = jnp.asarray(rng.standard_normal((SB, 1, SS, SD)), dtype=jnp.bfloat16)
    lens_s = jnp.full((SB,), SS, jnp.int32)
    skv_bytes = 2 * SB * 1 * SS * SD * 2
    reg("streaming_dma_decode_b256_s4096",
        functools.partial(ops.streaming_decode, block_s=512, seq_chunk=8),
        (qs, ks_c, vs_c, lens_s), bytes_accessed=skv_bytes,
        flops=4 * SB * SH * SS * SD)

    return benches, benchmark_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--long", action="store_true",
                    help="include the seq 8k/16k/32k attention rungs")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=None, help="results json path")
    ap.add_argument(
        "--isolated", action="store_true",
        help="run each rung in a fresh subprocess: a TPU-worker crash kills "
             "the in-process PJRT client permanently, so only process "
             "isolation lets the remaining rungs survive",
    )
    ap.add_argument(
        "--trace", default=None, metavar="SUBSTR",
        help="capture a jax.profiler trace of the matching rung instead of "
             "timing it (the reference's per-file ncu recipe, section 5.1)",
    )
    args = ap.parse_args()

    if args.isolated:
        return run_isolated(args)

    benches, benchmark_chained = build_benches(args.quick, args.long)
    if args.trace:
        from flashattention_kernel_project_tpu.utils.benchmarking import (
            capture_trace,
        )

        for b in benches:
            if args.trace in b["name"]:
                d = capture_trace(
                    b["fn"], *b["args"],
                    trace_dir=f"/tmp/fkp_trace_{b['name']}",
                )
                print(f"{b['name']}: trace written to {d} "
                      "(open with XProf / ui.perfetto.dev)")
                return
        print(f"no bench matches --trace {args.trace}")
        return
    import datetime

    import jax

    from flashattention_kernel_project_tpu.utils import platform
    from flashattention_kernel_project_tpu.utils.benchmarking import (
        benchmark_device,
    )

    # provenance per row (VERDICT r1: rows from different sessions/tunnel
    # states were indistinguishable) — the reference's config echo
    # (flashattn_forward_wmma.cu:406-407) as machine-readable fields
    def provenance(method: str, iters: int) -> dict:
        return dict(
            timestamp=datetime.datetime.now(datetime.UTC).isoformat(
                timespec="seconds"),
            device=str(jax.devices()[0].device_kind),
            method=method,
            iters=iters,
            loadavg=round(os.getloadavg()[0], 2),
        )

    on_tpu = platform.has_tpu()
    # contention guard (VERDICT r2 #10): this is a 1-core host — a rung
    # captured while anything else runs reads 3-5x low (the r2
    # softmax_8192x4096 anomaly: 0.79x -> 0.26x at loadavg 1.7+). Any row
    # captured above the threshold is re-measured once after a settle
    # wait; if still contended it ships with "tainted": true.
    LOADAVG_TAINT = 1.5
    results = []
    for b in benches:
        if args.only and args.only not in b["name"]:
            continue
        try:
            for attempt in range(2):
                if on_tpu:
                    # calibrated path: device-trace timing (hardware
                    # timestamps, immune to tunnel dispatch jitter that made
                    # three round-1 GEMM rungs read >1.0x roofline)
                    r = benchmark_device(
                        b["fn"], *b["args"], name=b["name"], chain=b["chain"],
                        flops=b["flops"], bytes_accessed=b["bytes_accessed"],
                    )
                    method = "device_trace"
                else:
                    r = benchmark_chained(
                        b["fn"], *b["args"], name=b["name"], chain=b["chain"],
                        n_pair=b["n_pair"], flops=b["flops"],
                        bytes_accessed=b["bytes_accessed"],
                    )
                    method = "host_chained"
                load = os.getloadavg()[0]
                if load <= LOADAVG_TAINT or attempt == 1:
                    break
                print(f"{b['name']}: loadavg {load:.2f} > {LOADAVG_TAINT} — "
                      "re-measuring after settle", flush=True)
                import time as _time
                _time.sleep(30)
            print(r.report(b["dtype"]), flush=True)
            row = dict(name=b["name"], ms=r.mean_ms, tflops=r.tflops,
                       gbps=r.gbps, roofline=r.roofline_fraction(b["dtype"]),
                       **provenance(method, r.iters))
            if row["loadavg"] > LOADAVG_TAINT:
                row["tainted"] = True
            results.append(row)
        except Exception as e:  # noqa: BLE001 — keep the suite running
            print(f"{b['name']}: FAILED {type(e).__name__}: {e}", flush=True)
            results.append(dict(name=b["name"], error=str(e)))

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.json"
    )
    # merge BEFORE opening for write: open(out, "w") truncates, and an
    # argument-position _merge_rows(out, ...) would read the already-empty
    # file (this exact bug silently clobbered the canonical table to a
    # single row mid-round-4 — recovered from the per-commit snapshots)
    merged = _merge_rows(out if args.only else None, results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"wrote {out}")


def _merge_rows(existing_path, new_rows):
    """Partial runs (--only) MERGE into the canonical file by rung name
    instead of clobbering it — re-measured rungs update in place, the
    rest keep their provenance."""
    if not existing_path or not os.path.exists(existing_path):
        return new_rows
    try:
        old = json.load(open(existing_path))
    except (json.JSONDecodeError, OSError):
        return new_rows
    by_name = {r.get("name"): r for r in new_rows}
    merged = [by_name.pop(r.get("name"), r) for r in old]
    return merged + list(by_name.values())


def run_isolated(args):
    import subprocess
    import tempfile
    import time

    # the parent only needs rung NAMES — build them on CPU so the parent
    # never owns the TPU (the children need it exclusively)
    import jax

    jax.config.update("jax_platforms", "cpu")
    names = [b["name"] for b in build_benches(args.quick, args.long)[0]]
    if args.only:
        names = [n for n in names if args.only in n]
    results = []
    me = os.path.abspath(__file__)
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.json"
    )
    for name in names:
        with tempfile.NamedTemporaryFile(suffix=".json") as tf:
            cmd = [sys.executable, me, "--only", name, "--out", tf.name]
            if args.quick:
                cmd.append("--quick")
            if args.long:
                cmd.append("--long")
            for attempt in range(2):
                try:
                    proc = subprocess.run(cmd, capture_output=True, text=True,
                                          timeout=3000)
                    sys.stdout.write(proc.stdout.rsplit("wrote ", 1)[0])
                    sys.stdout.flush()
                except subprocess.TimeoutExpired:
                    print(f"{name}: TIMEOUT (3000s)", flush=True)
                try:
                    got = json.load(open(tf.name))
                except (json.JSONDecodeError, OSError):
                    got = [dict(name=name, error="subprocess died")]
                if got and "error" in got[0] and attempt == 0:
                    time.sleep(60)  # worker restart window, then retry once
                    continue
                break
            results.extend(got)
            # write INCREMENTALLY: a rung costs minutes of remote compile,
            # and losing the whole session to an outer timeout on the last
            # rung is the failure mode round 2 nearly hit
            merged = _merge_rows(out if args.only else None, results)
            with open(out, "w") as f:
                json.dump(merged, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
