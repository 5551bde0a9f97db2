"""Quantization numerics: <=1e-2 max-abs vs fp32 oracle at matching bit-width
(BASELINE.md gate)."""

import jax.numpy as jnp
import numpy as np

from flashattention_kernel_project_tpu import ops
from flashattention_kernel_project_tpu.utils import oracles
from flashattention_kernel_project_tpu.utils.testing import assert_max_abs, assert_rel_l2
import pytest


@pytest.mark.smoke
def test_int8_roundtrip(rng):
    x = rng.standard_normal((64, 256), dtype=np.float32)
    q, scale = ops.quantize_int8(jnp.asarray(x))
    back = ops.dequantize_int8(q, scale)
    # absmax/127 quantization step bound
    step = np.abs(x).max(-1, keepdims=True) / 127.0
    assert np.all(np.abs(np.asarray(back) - x) <= step + 1e-6)


def test_fp8_roundtrip(rng):
    x = rng.standard_normal((64, 128), dtype=np.float32)
    q, scale = ops.quantize_fp8(jnp.asarray(x))
    back = ops.dequantize_fp8(q, scale)
    assert_rel_l2(back, x, tol=0.06)  # e4m3 has ~2 decimal digits


@pytest.mark.smoke
def test_matmul_int8_weights(rng):
    m, k, n = 128, 256, 256
    x = rng.standard_normal((m, k), dtype=np.float32).astype(np.float32)
    w = rng.standard_normal((k, n), dtype=np.float32)
    w_q, w_scale = ops.quantize_int8(jnp.asarray(w), axis=0)  # per-column
    got = ops.matmul_int8_weights(
        jnp.asarray(x), w_q, w_scale, block_m=128, block_n=128, block_k=128
    )
    # oracle at the same bit-width: dequantized weights, fp32 accumulate
    w_deq = np.asarray(ops.dequantize_int8(w_q, w_scale))
    assert_rel_l2(got, oracles.gemm(x, w_deq), tol=1e-2)


def test_quantize_kv_shapes(rng):
    k = rng.standard_normal((2, 4, 64, 32), dtype=np.float32)
    v = rng.standard_normal((2, 4, 64, 32), dtype=np.float32)
    k_q, k_s, v_q, v_s = ops.quantize_kv(jnp.asarray(k), jnp.asarray(v))
    assert k_q.shape == k.shape and k_q.dtype == jnp.int8
    assert k_s.shape == (2, 4, 64, 1)
    back = ops.dequantize_int8(k_q, k_s)
    step = np.abs(k).max(-1, keepdims=True) / 127.0
    assert np.all(np.abs(np.asarray(back) - k) <= step + 1e-6)


def test_matmul_int8_both_operands(rng):
    """Fully-quantized int8 x int8 GEMM: the int32 accumulate is exact, so
    the result must equal dequant(a) @ dequant(b) to fp32 rounding."""
    from flashattention_kernel_project_tpu.ops.quant import (
        dequantize_int8, matmul_int8, quantize_int8,
    )

    a = rng.standard_normal((200, 320), dtype=np.float32)
    b = rng.standard_normal((320, 150), dtype=np.float32)
    a_q, a_s = quantize_int8(jnp.asarray(a), axis=1)   # per-row
    b_q, b_s = quantize_int8(jnp.asarray(b), axis=0)   # per-column
    out = matmul_int8(a_q, a_s, b_q, b_s, block_m=128, block_n=128, block_k=128)
    ref = np.asarray(dequantize_int8(a_q, a_s)) @ np.asarray(
        dequantize_int8(b_q, b_s)
    )
    assert_rel_l2(np.asarray(out), ref, 1e-5)
    # and the quantization error vs full precision stays int8-sized
    assert_rel_l2(np.asarray(out), a @ b, 2e-2)


def test_matmul_fp8_weights(rng):
    """FP8 (e4m3) weight-only matmul vs the dequantized-weights oracle at
    the same bit-width (BASELINE's INT8/FP8 weight-only north star)."""
    m, k, n = 128, 256, 256
    x = rng.standard_normal((m, k), dtype=np.float32)
    w = rng.standard_normal((k, n), dtype=np.float32)
    w_q, w_scale = ops.quantize_fp8_weights(jnp.asarray(w))
    assert w_q.dtype == jnp.float8_e4m3fn and w_scale.shape == (1, n)
    got = ops.matmul_fp8_weights(
        jnp.asarray(x), w_q, w_scale, block_m=128, block_n=128, block_k=128
    )
    w_deq = np.asarray(w_q, np.float32) * np.asarray(w_scale)
    assert_rel_l2(got, oracles.gemm(x, w_deq), tol=1e-2)


def test_matmul_fp8_weights_ragged_shapes(rng):
    """Non-multiple-of-block shapes exercise the padding path."""
    m, k, n = 100, 200, 130
    x = rng.standard_normal((m, k), dtype=np.float32)
    w = rng.standard_normal((k, n), dtype=np.float32)
    w_q, w_scale = ops.quantize_fp8_weights(jnp.asarray(w))
    got = ops.matmul_fp8_weights(
        jnp.asarray(x), w_q, w_scale, block_m=128, block_n=128, block_k=128
    )
    w_deq = np.asarray(w_q, np.float32) * np.asarray(w_scale)
    assert_rel_l2(got, oracles.gemm(x, w_deq), tol=1e-2)
