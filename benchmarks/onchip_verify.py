#!/usr/bin/env python
"""On-chip numerics verification (the /verify flow, scripted).

Drives the public package boundary on the REAL TPU (plain `python`, axon
tunnel): oracle-checked causal GQA forward (both softmax disciplines),
ragged masking, KV-quantized dense forward (int8), and a grad step.
Progress is printed after every stage (remote compiles are slow); run
under `timeout 1750`. Keeps to ~7 distinct jitted programs.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()


def log(*a):
    print(f"[{time.time() - t0:6.1f}s]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log("devices:", jax.devices())
    import flashattention_kernel_project_tpu as fkp
    from flashattention_kernel_project_tpu.utils import oracles
    from flashattention_kernel_project_tpu.utils.testing import rel_l2

    rng = np.random.default_rng(7)
    B, H, KH, N, D = 1, 4, 2, 2048, 128
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, KH, N, D)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, KH, N, D)), dtype=jnp.bfloat16)
    exp = oracles.gqa_attention(
        *(np.asarray(x, np.float32) for x in (q, k, v)), causal=True
    )
    log("oracle done")

    for stable in (False, True):
        o = fkp.ops.flash_attention(q, k, v, causal=True, stable=stable)
        e = rel_l2(np.asarray(o, np.float32), exp)
        log(f"causal stable={stable} rel-L2: {e:.2e}")
        assert e < 1e-2, e

    # KV-quantized forward vs the dequantized-cache oracle (same bit-width)
    k_q, k_s, v_q, v_s = fkp.ops.quantize_kv(k, v)
    oq = fkp.ops.flash_attention_kv_quant(
        q, k_q, k_s, v_q, v_s, causal=True, stable=False
    )
    kd = np.asarray(k_q, np.float32) * np.asarray(k_s, np.float32)
    vd = np.asarray(v_q, np.float32) * np.asarray(v_s, np.float32)
    expq = oracles.gqa_attention(np.asarray(q, np.float32), kd, vd, causal=True)
    eq = rel_l2(np.asarray(oq, np.float32), expq)
    log(f"kv-quant int8 causal rel-L2: {eq:.2e}")
    assert eq < 1e-2, eq

    # ragged masking (stable=False exercises the fixed-max mask path)
    qr = jnp.asarray(rng.standard_normal((B, H, 200, D)), dtype=jnp.bfloat16)
    kr = jnp.asarray(rng.standard_normal((B, KH, 333, D)), dtype=jnp.bfloat16)
    vr = jnp.asarray(rng.standard_normal((B, KH, 333, D)), dtype=jnp.bfloat16)
    expr = oracles.gqa_attention(
        *(np.asarray(x, np.float32) for x in (qr, kr, vr)), causal=False
    )
    orr = fkp.ops.flash_attention(qr, kr, vr, causal=False, stable=False)
    er = rel_l2(np.asarray(orr, np.float32), expr)
    log(f"ragged 200x333 stable=False rel-L2: {er:.2e}")
    assert er < 1e-2, er

    g = jax.grad(
        lambda q, k, v: fkp.ops.flash_attention(q, k, v, causal=True)
        .astype(jnp.float32)
        .sum()
    )(q, k, v)
    log("grad finite:", bool(np.isfinite(np.asarray(g, np.float32)).all()))

    print("VERIFY PASS", flush=True)


if __name__ == "__main__":
    main()
