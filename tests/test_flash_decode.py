"""Split-KV decode vs the attention oracle, fp and int8 KV paths.

The decode shape is the reference's streaming kernel problem (B sequences,
small Q block, K/V streamed over seq — flashattn_streaming_16x16.cu mains);
the split-merge uses the associative (m, l, y) algebra those kernels
introduced."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_kernel_project_tpu import ops
from flashattention_kernel_project_tpu.utils import oracles
from flashattention_kernel_project_tpu.utils.testing import assert_rel_l2


def _decode_oracle(q, k_cache, v_cache, lengths):
    """Per-sequence masked GQA attention for the single query token."""
    b, hq, d = q.shape
    hkv = k_cache.shape[1]
    outs = []
    for i in range(b):
        s = int(lengths[i])
        o = oracles.gqa_attention(
            q[i : i + 1, :, None, :],  # [1, hq, 1, d]
            k_cache[i : i + 1, :, :s],
            v_cache[i : i + 1, :, :s],
        )
        outs.append(o[:, :, 0])
    return np.concatenate(outs, axis=0)


@pytest.mark.parametrize("n_splits", [1, 4])
@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_flash_decode(rng, n_splits, hq, hkv):
    b, s_max, d = 3, 160, 64
    q = rng.standard_normal((b, hq, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s_max, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s_max, d), dtype=np.float32)
    lengths = np.array([160, 97, 1], dtype=np.int32)

    got = ops.flash_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
        n_splits=n_splits,
    )
    exp = _decode_oracle(q, k, v, lengths)
    assert_rel_l2(got, exp, tol=1e-2)


def test_flash_decode_int8(rng):
    b, hq, hkv, s_max, d = 2, 8, 2, 128, 64
    q = rng.standard_normal((b, hq, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s_max, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s_max, d), dtype=np.float32)
    lengths = np.array([128, 57], dtype=np.int32)

    k_q, k_s, v_q, v_s = ops.quantize_kv(jnp.asarray(k), jnp.asarray(v))
    got = ops.flash_decode_int8(
        jnp.asarray(q), k_q, k_s, v_q, v_s, jnp.asarray(lengths), n_splits=4
    )
    # oracle at matching bit-width: dequantized cache through fp32 attention
    k_dq = np.asarray(ops.dequantize_int8(k_q, k_s))
    v_dq = np.asarray(ops.dequantize_int8(v_q, v_s))
    exp = _decode_oracle(q, k_dq, v_dq, lengths)
    assert_rel_l2(got, exp, tol=1e-2)


def test_flash_decode_matches_flash_attention(rng):
    """Decode of the last position == causal flash_attention's last row."""
    b, hq, hkv, s, d = 2, 4, 2, 96, 32
    k = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    q_full = rng.standard_normal((b, hq, s, d), dtype=np.float32)

    full = ops.flash_attention(
        jnp.asarray(q_full), jnp.asarray(k), jnp.asarray(v), causal=True,
        block_q=32, block_k=32,
    )
    dec = ops.flash_decode(
        jnp.asarray(q_full[:, :, -1]), jnp.asarray(k), jnp.asarray(v),
        jnp.full((b,), s, dtype=jnp.int32), n_splits=2,
    )
    assert_rel_l2(dec, np.asarray(full)[:, :, -1], tol=1e-3)
