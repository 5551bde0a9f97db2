"""Hand-rolled double-buffered streaming decode vs the grid-pipelined decode
and the oracle — the explicit producer/consumer rung (reference sections
2.6-2.8)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_kernel_project_tpu import ops
from flashattention_kernel_project_tpu.utils import oracles
from flashattention_kernel_project_tpu.utils.testing import assert_rel_l2


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
@pytest.mark.smoke
def test_streaming_decode_matches_oracle(rng, hq, hkv):
    b, s_max, d = 3, 160, 64
    q = rng.standard_normal((b, hq, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s_max, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s_max, d), dtype=np.float32)
    lengths = np.array([160, 97, 1], dtype=np.int32)

    got = ops.streaming_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
        block_s=32,
    )
    for i in range(b):
        exp = oracles.gqa_attention(
            q[i : i + 1, :, None, :], k[i : i + 1, :, : lengths[i]],
            v[i : i + 1, :, : lengths[i]],
        )[:, :, 0]
        assert_rel_l2(np.asarray(got)[i : i + 1], exp, tol=1e-2)


def test_streaming_decode_matches_grid_pipelined(rng):
    """The manual DMA pipeline and the implicit grid pipeline must agree."""
    b, hq, hkv, s, d = 2, 8, 2, 128, 32
    q = rng.standard_normal((b, hq, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    lengths = np.array([128, 55], np.int32)
    a = ops.streaming_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
        block_s=32,
    )
    bb = ops.flash_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
        n_splits=2,
    )
    assert_rel_l2(a, np.asarray(bb), tol=1e-4)


def test_streaming_decode_zero_length(rng):
    q = rng.standard_normal((2, 4, 32), dtype=np.float32)
    k = rng.standard_normal((2, 4, 64, 32), dtype=np.float32)
    v = rng.standard_normal((2, 4, 64, 32), dtype=np.float32)
    got = ops.streaming_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray([64, 0], dtype=jnp.int32), block_s=32,
    )
    assert np.isfinite(np.asarray(got)).all()
    assert np.abs(np.asarray(got)[1]).max() == 0.0


@pytest.mark.parametrize("seq_chunk", [4, 8])
def test_streaming_decode_seq_chunk(rng, seq_chunk):
    """Chunked programs (one wide DMA per tile, unrolled per-seq compute)
    must match the one-sequence-per-program kernel exactly, including
    ragged lengths inside a chunk."""
    b, hq, hkv, s, d = 16, 4, 2, 256, 128
    q = rng.standard_normal((b, hq, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    lengths = rng.integers(1, s + 1, size=b).astype(np.int32)
    lengths[0] = s
    lengths[1] = 1
    a = ops.streaming_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
        block_s=64,
    )
    c = ops.streaming_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
        block_s=64, seq_chunk=seq_chunk,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-5,
                               atol=2e-5)
