#!/usr/bin/env python
"""Crash-tolerant interleaved A/B timing of forward-kernel variants.

The axon TPU worker sporadically crashes/restarts and per-process clocks
drift with host CPU load, so: run each round in a fresh process on an IDLE
host, interleave variants within the round, repeat rounds, aggregate with
the median (or min for a floor estimate).

Usage: python benchmarks/ab_fwd.py '[("name", {kwargs...}), ...]'
Per-variant kwargs: block_q, block_k, num_sub, pipeline_subs, causal,
seq, d, heads, kv_heads, min_delta_s. Prints one RESULT line per variant.
"""

import ast
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    variants = ast.literal_eval(sys.argv[1]) if len(sys.argv) > 1 else [
        ("ns1_bk1024", dict(num_sub=1, block_k=1024)),
    ]
    import numpy as np
    import jax.numpy as jnp
    from flashattention_kernel_project_tpu.ops.flash_attention import _fwd
    from flashattention_kernel_project_tpu.utils.benchmarking import benchmark_chained

    rng = np.random.default_rng(42)
    fns = []
    for name, kw in variants:
        kw = dict(kw)
        B = kw.pop("batch", 1)
        H = kw.pop("heads", 16)
        HKV = kw.pop("kv_heads", 4)
        N = kw.pop("seq", 4096)
        D = kw.pop("d", 128)
        cz = kw.pop("causal", True)
        delta = kw.pop("min_delta_s", 2.0)
        q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, HKV, N, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, HKV, N, D)), jnp.bfloat16)
        fl = 4 * B * H * N * N * D * (0.5 if cz else 1.0)
        fn = functools.partial(
            _fwd, causal=cz, sm_scale=None, q_offset=0,
            block_q=kw.pop("block_q", 512), block_k=kw.pop("block_k", 1024),
            interpret=False, **kw,
        )
        fns.append((name, (lambda f: lambda q, k, v: f(q, k, v)[0])(fn),
                    (q, k, v), fl, delta))

    for name, f, args, fl, delta in fns:
        try:
            r = benchmark_chained(
                f, *args, name=name, flops=fl, reps=4, min_delta_s=delta
            )
            print(f"RESULT {name} {r.mean_ms:.4f} ms {r.tflops:.2f} TF",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"RESULT {name} CRASH {type(e).__name__}", flush=True)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
