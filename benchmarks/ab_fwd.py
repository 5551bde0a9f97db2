#!/usr/bin/env python
"""Crash-tolerant interleaved A/B timing of forward-kernel variants.

The axon TPU worker sporadically crashes/restarts and per-process clocks
drift, so: each round runs every variant once (interleaved), rounds repeat,
and the reported number is the MIN per-iter time across rounds. Run each
invocation in a fresh process; a crashed round just counts less.

Usage: python benchmarks/ab_fwd.py '[("name", {kwargs...}), ...]'
Prints one line per variant per round; aggregate with min.
"""

import ast
import functools
import sys


def main():
    variants = ast.literal_eval(sys.argv[1]) if len(sys.argv) > 1 else [
        ("ns1_bk512", dict(num_sub=1, block_k=512)),
        ("ns2_bk512", dict(num_sub=2, block_k=512)),
    ]
    causal = True
    import numpy as np
    import jax.numpy as jnp
    from flashattention_kernel_project_tpu.ops.flash_attention import _fwd
    from flashattention_kernel_project_tpu.utils.benchmarking import benchmark_chained

    B, H, HKV, N, D = 1, 16, 4, 4096, 128
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, HKV, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, HKV, N, D)), jnp.bfloat16)

    fns = []
    for name, kw in variants:
        kw = dict(kw)
        cz = kw.pop("causal", causal)
        fl = 4 * B * H * N * N * D * (0.5 if cz else 1.0)
        fn = functools.partial(
            _fwd, causal=cz, sm_scale=None, q_offset=0,
            block_q=kw.pop("block_q", 512), block_k=kw.pop("block_k", 512),
            interpret=False, **kw,
        )
        fns.append((name, (lambda f: lambda q, k, v: f(q, k, v)[0])(fn), fl))

    for name, f, fl in fns:
        try:
            r = benchmark_chained(f, q, k, v, name=name, flops=fl)
            print(f"RESULT {name} {r.mean_ms:.4f} ms {r.tflops:.2f} TF",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"RESULT {name} CRASH {type(e).__name__}", flush=True)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
