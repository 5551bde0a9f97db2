"""GEMM ladder vs CPU oracle — the reference's per-binary verify loop
(naive_gemm.cu:144-152 max-abs-diff) as parametrized pytest."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_kernel_project_tpu import ops
from flashattention_kernel_project_tpu.utils import oracles
from flashattention_kernel_project_tpu.utils.testing import assert_max_abs, assert_rel_l2


@pytest.mark.parametrize("m,k,n", [(256, 256, 256), (512, 384, 256), (200, 130, 72)])
@pytest.mark.smoke
def test_matmul_fp32(rng, m, k, n):
    a = rng.standard_normal((m, k), dtype=np.float32)
    b = rng.standard_normal((k, n), dtype=np.float32)
    got = ops.matmul(jnp.asarray(a), jnp.asarray(b), block_m=128, block_n=128, block_k=128)
    assert_max_abs(got, oracles.gemm(a, b), tol=1e-2)


def test_matmul_xla_baseline(rng):
    a = rng.standard_normal((128, 256), dtype=np.float32)
    b = rng.standard_normal((256, 64), dtype=np.float32)
    assert_max_abs(ops.matmul_xla(jnp.asarray(a), jnp.asarray(b)), oracles.gemm(a, b), tol=1e-2)


@pytest.mark.smoke
def test_matmul_bf16(rng):
    a = rng.standard_normal((256, 256), dtype=np.float32)
    b = rng.standard_normal((256, 256), dtype=np.float32)
    got = ops.matmul_bf16(jnp.asarray(a), jnp.asarray(b), block_m=128, block_n=128, block_k=128)
    # bf16 inputs: compare against oracle on the rounded inputs, rel-L2
    a16 = np.asarray(jnp.asarray(a).astype(jnp.bfloat16).astype(jnp.float32))
    b16 = np.asarray(jnp.asarray(b).astype(jnp.bfloat16).astype(jnp.float32))
    assert_rel_l2(got, oracles.gemm(a16, b16), tol=1e-2)


@pytest.mark.parametrize("bsz", [1, 4])
def test_batched_matmul(rng, bsz):
    a = rng.standard_normal((bsz, 256, 128), dtype=np.float32)
    b = rng.standard_normal((bsz, 128, 192), dtype=np.float32)
    got = ops.batched_matmul(
        jnp.asarray(a), jnp.asarray(b), block_m=128, block_n=128, block_k=128
    )
    assert_max_abs(got, oracles.gemm(a, b), tol=1e-2)


def test_matmul_fused_epilogue(rng):
    m, k, n = 256, 192, 256
    a = rng.standard_normal((m, k), dtype=np.float32)
    b = rng.standard_normal((k, n), dtype=np.float32)
    bias = rng.standard_normal(n, dtype=np.float32)
    res = rng.standard_normal((m, n), dtype=np.float32)
    got = ops.matmul_fused_epilogue(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(bias), jnp.asarray(res),
        block_m=128, block_n=128, block_k=64,
    )
    assert_max_abs(got, oracles.gemm_fused_epilogue(a, b, bias, res), tol=1e-2)


@pytest.mark.parametrize("dtype", [np.float32, "bf16"])
def test_batched_matmul_softmax_epilogue(rng, dtype):
    """Rung 6: softmax fused on the fp32 accumulator, whole row on-chip."""
    b, m, k, n = 3, 96, 128, 160
    a = rng.standard_normal((b, m, k)).astype(np.float32)
    w = rng.standard_normal((b, k, n)).astype(np.float32)
    bias = rng.standard_normal((n,)).astype(np.float32)
    aj, wj = jnp.asarray(a), jnp.asarray(w)
    if dtype == "bf16":
        aj, wj = aj.astype(jnp.bfloat16), wj.astype(jnp.bfloat16)
    got = ops.batched_matmul_softmax_epilogue(
        aj, wj, jnp.asarray(bias), scale=0.125, block_m=32, block_k=64,
    )
    z = (np.einsum("bmk,bkn->bmn", a, w) * 0.125 + bias).astype(np.float64)
    z = z - z.max(-1, keepdims=True)
    e = np.exp(z)
    exp = e / e.sum(-1, keepdims=True)
    tol = 1e-2 if dtype == "bf16" else 1e-5
    assert_rel_l2(np.asarray(got), exp.astype(np.float32), tol=tol)
    # rows sum to one, padded columns excluded (n=160 pads to 256 lanes)
    np.testing.assert_allclose(np.asarray(got).sum(-1), 1.0, rtol=1e-3)


def test_batched_matmul_softmax_epilogue_resident(rng):
    """Rung 6b (round 5): the A-resident fixed-max structure — whole-K
    dots, in-place whole-row normalize, manual DMA store — must match the
    rows kernel's math, including ragged N (masked pad columns)."""
    b, m, k, n = 2, 1088, 256, 200
    a = rng.standard_normal((b, m, k)).astype(np.float32)
    w = rng.standard_normal((b, k, n)).astype(np.float32)
    bias = rng.standard_normal((n,)).astype(np.float32)
    got = ops.batched_matmul_softmax_epilogue(
        jnp.asarray(a).astype(jnp.bfloat16),
        jnp.asarray(w).astype(jnp.bfloat16),
        jnp.asarray(bias), scale=0.125, out_dtype=jnp.bfloat16,
        resident=True,
    )
    z = (np.einsum("bmk,bkn->bmn", a, w) * 0.125 + bias).astype(np.float64)
    z = z - z.max(-1, keepdims=True)
    e = np.exp(z)
    exp = e / e.sum(-1, keepdims=True)
    assert np.asarray(got).shape == (b, m, n)
    assert_rel_l2(np.asarray(got, np.float32), exp.astype(np.float32),
                  tol=1e-2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32).sum(-1), 1.0, rtol=1e-2
    )


def test_batched_matmul_softmax_epilogue_resident_guard_fallback(rng):
    """Out-of-band logits (fixed-max range breach) must flip the l-range
    witness and fall back to the always-correct rows kernel — the output
    is right for ANY input, same contract as the attention guard."""
    b, m, k, n = 1, 1024, 256, 128
    a = 40.0 * rng.standard_normal((b, m, k)).astype(np.float32)
    w = 40.0 * rng.standard_normal((b, k, n)).astype(np.float32)
    bias = rng.standard_normal((n,)).astype(np.float32)
    got = ops.batched_matmul_softmax_epilogue(
        jnp.asarray(a), jnp.asarray(w), jnp.asarray(bias),
        scale=1.0, out_dtype=jnp.float32, resident=True,
    )
    z = (np.einsum("bmk,bkn->bmn", a, w) * 1.0 + bias).astype(np.float64)
    z = z - z.max(-1, keepdims=True)
    e = np.exp(z)
    exp = e / e.sum(-1, keepdims=True)
    assert_rel_l2(np.asarray(got), exp.astype(np.float32), tol=1e-2)
