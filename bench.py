#!/usr/bin/env python
"""Headline benchmark: fused FlashAttention forward TFLOP/s on one TPU chip.

Config mirrors BASELINE.json's target: causal GQA attention, d=128,
seq 4096, bf16 in / fp32 acc. `vs_baseline` is achieved / target where
target = 70% of the chip's bf16 MXU roofline (BASELINE.md: ">=70% of
roofline, d=128, seq 4K-32K") — vs_baseline >= 1.0 means the target is met.

Timing: the axon tunnel makes `block_until_ready` unreliable and adds a
fixed ~140 ms dispatch+fetch round trip, so we time n1 vs n2 chained kernel
iterations inside one jit (lax.fori_loop, output fed back as the next
query) and report the delta slope — pure kernel throughput, overhead-free.
Prints exactly ONE JSON line to stdout.
"""

import functools
import json
import sys

import numpy as np


def main():
    # if the axon tunnel is down (observed: ~25 min init hang then
    # UNAVAILABLE), report that honestly instead of crashing with no output
    try:
        import jax

        jax.devices()
    except RuntimeError as e:
        print(
            json.dumps(
                {
                    "metric": "flashattention_fwd_causal_gqa_d128_seq4k_tflops",
                    "value": 0.0,
                    "unit": "TFLOP/s",
                    "vs_baseline": 0.0,
                    "error": f"TPU backend unavailable: {e}"[:200],
                }
            )
        )
        return 0

    import jax.numpy as jnp

    from flashattention_kernel_project_tpu import ops
    from flashattention_kernel_project_tpu.utils import platform
    from flashattention_kernel_project_tpu.utils.benchmarking import (
        benchmark_chained,
    )

    B, H, HKV, N, D = 1, 16, 4, 4096, 128
    CAUSAL = True
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, HKV, N, D)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, HKV, N, D)), dtype=jnp.bfloat16)

    # Headline: stable="auto" — the per-q-block hybrid kernel,
    # unconditionally correct on ANY input (each q block runs the fixed-max
    # discipline only where its Cauchy-Schwarz score bound proves it safe,
    # the online rescale otherwise). No host-side input check: the bound is
    # part of the computation. The k half of the bound (max||k||, a
    # property of K alone) is precomputed once here via ops.k_max_norm —
    # the per-(K, layer) caching mode VERDICT r3 prescribed (a serving
    # stack maintains it incrementally with the KV cache; it is a cached
    # statistic, not a correctness check — any input still gets the right
    # answer). results.json carries the uncached rung too
    # (flashattn_fwd_causal_d128_seq4k_auto).
    k_max = ops.k_max_norm(k)
    import jax as _jax

    _jax.block_until_ready(k_max)
    fa = functools.partial(
        ops.flash_attention, causal=CAUSAL, stable="auto", k_max=k_max
    )

    # causal useful FLOPs: 2 matmuls, half the score matrix
    flops = 4 * B * H * N * N * D * (0.5 if CAUSAL else 1.0)
    on_tpu = platform.has_tpu()
    if on_tpu:
        # calibrated: device-trace timing (hardware timestamps inside one
        # chained dispatch — immune to the tunnel's 100s-of-ms dispatch
        # jitter, which biased round-1 host-delta numbers ~8-17% OPTIMISTIC:
        # three GEMM rungs read >1.0x roofline). Median of 3 traces.
        from flashattention_kernel_project_tpu.utils.benchmarking import (
            benchmark_device,
        )

        per_iters = []
        for _ in range(3):
            r = benchmark_device(
                fa, q, k, v, name="fa", flops=flops, min_device_s=0.3
            )
            per_iters.append(r.mean_ms)
        per_iters.sort()
        per_iter = per_iters[1] * 1e-3
    else:
        r = benchmark_chained(
            fa, q, k, v, name="fa", flops=flops,
            n_pair=(1, 2), reps=1, min_delta_s=0.0,
        )
        per_iter = r.mean_ms * 1e-3
    tflops = flops / per_iter / 1e12
    target = 0.70 * platform.tpu_peak_flops("bf16") / 1e12
    print(
        json.dumps(
            {
                "metric": "flashattention_fwd_causal_gqa_d128_seq4k_tflops",
                "value": round(tflops, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(tflops / target, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
