#!/usr/bin/env python
"""Paged int8 decode A/B (VERDICT r4 task 3): experiment, don't attribute.

r3 refuted the descriptor-cost hypothesis (page 128/256/512 sweep was
flat) and then ATTRIBUTED the int8 gap (0.576-0.583x vs linear int8's
0.852x) to the 2-slot rotation buffering less deeply than the implicit
emitter — by analogy, not experiment. This runs the experiments:

  A. gather kernel, slots in {2, 3, 4}           (deeper in-flight DMA)
  B. the scalar-prefetch per-page BlockSpec path (gather=False) at
     page 512, where per-program page count is lowest
  C. a COPY-ONLY paged gather (same DMA pattern, no compute) — if C
     sits at the same GB/s, the DMA engine itself is the floor

Shapes mirror the canonical paged rungs: B=8, 8K tokens/seq.
"""

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--page", type=int, default=128)
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flashattention_kernel_project_tpu import ops
    from flashattention_kernel_project_tpu.utils.benchmarking import (
        benchmark_device,
    )
    from flashattention_kernel_project_tpu.utils.platform import (
        tpu_hbm_bandwidth,
    )

    B, HQ, HKV, D = args.batch, 16, 4, 128
    page, S = args.page, args.seq
    maxp = S // page
    n_pages = B * maxp + 1
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)
    kf = rng.standard_normal((n_pages, HKV, page, D)).astype(np.float32)
    vf = rng.standard_normal((n_pages, HKV, page, D)).astype(np.float32)
    tbl = jnp.asarray(
        np.arange(1, 1 + B * maxp).reshape(B, maxp), jnp.int32)
    lens = jnp.full((B,), S, jnp.int32)

    # int8 pool with lane-major scales
    kq = jnp.asarray(np.clip(kf * 30, -127, 127).astype(np.int8))
    vq = jnp.asarray(np.clip(vf * 30, -127, 127).astype(np.int8))
    ks = jnp.full((n_pages, HKV, 1, page), 1 / 30.0, jnp.float32)
    vs = jnp.full((n_pages, HKV, 1, page), 1 / 30.0, jnp.float32)
    kb = jnp.asarray(kf, jnp.bfloat16)
    vb = jnp.asarray(vf, jnp.bfloat16)

    # bandwidth accounting: the kernel streams the LIVE K+V bytes once
    bytes_int8 = 2 * B * HKV * S * D * 1
    bytes_bf16 = 2 * B * HKV * S * D * 2
    peak = tpu_hbm_bandwidth()

    def bench(name, fn, *a, nbytes):
        per = []
        try:
            for _ in range(3):
                r = benchmark_device(
                    fn, *a, name=name, min_device_s=0.25,
                    chain=lambda out, args_: (out.astype(jnp.bfloat16),) + tuple(args_[1:]),
                )
                per.append(r.mean_ms)
            per.sort()
            ms = per[1]
            gbps = nbytes / (ms * 1e-3) / 1e9
            print(f"{name:34s} {ms*1e3:9.1f} us  {gbps:7.1f} GB/s "
                  f" {gbps/ (peak/1e9):5.3f}x HBM", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} FAIL {str(e)[:100]}", flush=True)

    for slots in (2, 3, 4):
        bench(
            f"int8 gather slots={slots}",
            functools.partial(ops.paged_flash_decode_quant, slots=slots),
            q, kq, ks, vq, vs, tbl, lens, nbytes=bytes_int8,
        )
    bench(
        "int8 blockspec (per-page) ",
        functools.partial(ops.paged_flash_decode_quant, gather=False),
        q, kq, ks, vq, vs, tbl, lens, nbytes=bytes_int8,
    )
    for slots in (2, 4):
        bench(
            f"bf16 gather slots={slots}",
            functools.partial(ops.paged_flash_decode, slots=slots),
            q, kb, vb, tbl, lens, nbytes=bytes_bf16,
        )


if __name__ == "__main__":
    main()
# (appended by round 4) usage note: copy-only DMA-floor probe via
#   ops.paged_flash_decode(..., copy_only=True) on an int8-SIZED bf16 pool
