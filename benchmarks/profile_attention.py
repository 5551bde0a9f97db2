#!/usr/bin/env python
"""Stage-latency breakdown of the fused FlashAttention forward.

TPU analog of the reference's 5.6.x profiling ladder
(flashattn_stage_latency_breakdown.cu, flashattn_forward_cp_async_stall.cu,
flashattn_tensorcore_util_profile.cu, flashattn_forward_softmax_bottleneck.cu):
runs the copy-only / QK^T-only / PV-only / softmax-chain-only probes plus the
full fused kernel at the same grid and block shapes, so the per-stage cost
and the overlap quality fall out by subtraction.

Usage: python benchmarks/profile_attention.py [--block-q N] [--block-k N]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-q", type=int, default=512)
    ap.add_argument("--block-k", type=int, default=512)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    from flashattention_kernel_project_tpu import ops
    from flashattention_kernel_project_tpu.ops import probes
    from flashattention_kernel_project_tpu.utils import platform
    from flashattention_kernel_project_tpu.utils.benchmarking import (
        benchmark_chained,
        benchmark_device,
    )

    B, H, HKV, N, D = 1, 16, 4, args.seq, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, HKV, N, D)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, HKV, N, D)), dtype=jnp.bfloat16)
    n_pair = (4, 16) if args.quick else (20, 120)
    bq, bk = args.block_q, args.block_k

    # probes emit fp32 [B,H,N,D]; chain casts back to q dtype
    chain = lambda out, a: (out.astype(a[0].dtype),) + tuple(a[1:])  # noqa: E731

    stages = [
        ("copy_only (HBM pipeline)", probes.copy_probe),
        ("qk_only (MXU stage 1)", probes.qk_probe),
        ("pv_only (MXU stage 3)", probes.pv_probe),
        ("softmax_chain (VPU stage 2)", probes.softmax_chain_probe),
    ]
    def bench(fn, *a, name, chain=None):
        # device-trace timing on chip (calibrated; see utils.benchmarking)
        if platform.has_tpu():
            return benchmark_device(fn, *a, name=name, chain=chain)
        return benchmark_chained(fn, *a, name=name, chain=chain,
                                 n_pair=n_pair)

    results = {}
    for name, fn in stages:
        r = bench(
            functools.partial(fn, block_q=bq, block_k=bk),
            q, k, v, name=name, chain=chain,
        )
        results[name] = r.mean_ms
        print(f"{name:32s} {r.mean_ms:8.3f} ms", flush=True)

    flops = 4 * B * H * N * N * D
    for label, kw in (
        ("fused full (non-causal)", dict(causal=False)),
        ("fused full fast (stable=False)", dict(causal=False, stable=False)),
    ):
        r = bench(
            functools.partial(ops.flash_attention, block_q=bq, block_k=bk,
                              **kw),
            q, k, v, name=label,
        )
        results[label] = r.mean_ms
        print(f"{label:32s} {r.mean_ms:8.3f} ms "
              f"{flops / (r.mean_ms * 1e-3) / 1e12:8.1f} TFLOP/s", flush=True)
    serial = sum(results[kk] for kk, _ in stages)
    fused = results["fused full (non-causal)"]
    print(f"sum of stages {serial:.3f} ms vs fused {fused:.3f} ms "
          f"-> overlap factor {serial / fused:.2f}x")


if __name__ == "__main__":
    main()
