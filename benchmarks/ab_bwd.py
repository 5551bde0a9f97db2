#!/usr/bin/env python
"""Interleaved A/B timing of backward-kernel variants (round 5).

Same crash-tolerant pattern as ab_fwd.py: fresh process per round, one
RESULT line per variant, device-trace timing when on TPU.

Usage: python benchmarks/ab_bwd.py '[("name", {kwargs...}), ...]'
Per-variant kwargs: seq, d, heads, kv_heads, ds_bf16, tri_subs, fuse_dq,
block_q, block_k, causal. Prints RESULT <name> <ms> <TF> per variant.
"""

import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    variants = ast.literal_eval(sys.argv[1]) if len(sys.argv) > 1 else [
        ("r4_base", dict(ds_bf16=False, tri_subs=0)),
        ("tri4", dict(ds_bf16=False, tri_subs=4)),
    ]
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flashattention_kernel_project_tpu import ops
    from flashattention_kernel_project_tpu.ops.flash_attention import (
        _bwd_pallas,
    )
    from flashattention_kernel_project_tpu.utils.benchmarking import (
        benchmark_device,
    )

    rng = np.random.default_rng(42)
    cases = []
    for name, kw in variants:
        kw = dict(kw)
        B = kw.pop("batch", 1)
        H = kw.pop("heads", 16)
        HKV = kw.pop("kv_heads", 4)
        N = kw.pop("seq", 4096)
        D = kw.pop("d", 128)
        cz = kw.pop("causal", True)
        block_q = kw.pop("block_q", None)
        block_k = kw.pop("block_k", None)
        q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, HKV, N, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, HKV, N, D)), jnp.bfloat16)
        o, lse = ops.flash_attention_with_lse(q, k, v, causal=cz)
        jax.block_until_ready(o)
        res = (q, k, v, o, lse)
        smr = 1.0 / float(np.sqrt(D))
        fl = 10 * B * H * N * N * D * (0.5 if cz else 1.0)

        def bwd(g_, res=res, cz=cz, smr=smr, bq=block_q, bk=block_k, kw=kw):
            return _bwd_pallas(res, g_, cz, smr, 0, bq, bk, None, **kw)

        def chain(out, args):
            x = out[0].astype(jnp.float32)
            for r in out[1:]:
                x = x + r.astype(jnp.float32).mean() * 1e-20
            return (x.astype(jnp.bfloat16),)

        cases.append((name, bwd, (q,), chain, fl))

    for name, f, args, chain, fl in cases:
        try:
            r = benchmark_device(
                f, *args, name=name, chain=chain, flops=fl, min_device_s=0.3
            )
            print(f"RESULT {name} {r.mean_ms:.4f} ms {r.tflops:.2f} TF",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"RESULT {name} CRASH {type(e).__name__}: {e}"[:300],
                  flush=True)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
