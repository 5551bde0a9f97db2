#!/usr/bin/env python
"""Sweep fused-forward kernel variants (num_sub / pipeline / blocks) on TPU.

Delta-method timing (utils.benchmarking.benchmark_chained). Used to pick the
production defaults recorded in docs/perf_journal.md.
"""

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--causal", action="store_true", default=False)
    args = ap.parse_args()

    import jax.numpy as jnp

    from flashattention_kernel_project_tpu.ops.flash_attention import _fwd
    from flashattention_kernel_project_tpu.utils.benchmarking import benchmark_chained

    B, H, HKV, N, D = 1, args.heads, args.kv_heads, args.seq, args.d
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, HKV, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, HKV, N, D)), jnp.bfloat16)

    flops = 4 * B * H * N * N * D * (0.5 if args.causal else 1.0)

    for bq, bk in [(512, 512), (512, 1024), (1024, 1024)]:
        for ns in (1, 2, 4):
            for pipe in ((True, False) if ns > 1 else (True,)):
                fn = functools.partial(
                    _fwd,
                    causal=args.causal,
                    sm_scale=None,
                    q_offset=0,
                    block_q=bq,
                    block_k=bk,
                    interpret=False,
                    num_sub=ns,
                    pipeline_subs=pipe,
                )
                try:
                    r = benchmark_chained(
                        lambda q, k, v: fn(q, k, v)[0],
                        q, k, v,
                        name=f"bq={bq} bk={bk} ns={ns} pipe={int(pipe)}",
                        flops=flops,
                    )
                    print(r.report())
                except Exception as e:  # noqa: BLE001
                    print(f"bq={bq} bk={bk} ns={ns} pipe={int(pipe)}: "
                          f"FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
