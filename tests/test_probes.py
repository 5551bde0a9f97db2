"""Profiling probes stay runnable (interpret mode) and finite — they are the
perf-debugging tools (reference section 2.5 analogs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_kernel_project_tpu.ops import probes


@pytest.mark.parametrize(
    "probe",
    [probes.copy_probe, probes.qk_probe, probes.pv_probe, probes.softmax_chain_probe],
    ids=["copy", "qk", "pv", "softmax_chain"],
)
@pytest.mark.smoke
def test_probe_runs(rng, probe):
    q = jnp.asarray(rng.standard_normal((1, 2, 64, 32)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 64, 32)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 64, 32)), dtype=jnp.float32)
    out = probe(q, k, v, block_q=32, block_k=32)
    assert out.shape == (1, 2, 64, 32)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.smoke
def test_qk_packed_probe_matches_direct(rng):
    """The packed-shape QK envelope probe (VERDICT r4 task 5) computes the
    block-diagonal pair dot exactly: each (pair, slot) row's accumulated
    sum equals sum_s(q_A . k_A) + sum_s(q_B . k_B) for that slot's two
    packed heads."""
    b, hq, hkv, n, d = 1, 8, 4, 256, 32
    group = hq // hkv
    q = jnp.asarray(rng.standard_normal((b, hq, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, n, d)), jnp.float32)
    out = np.asarray(
        probes.qk_packed_probe(q, k, block_q=64, block_k=64, interpret=True)
    )
    assert out.shape == (b, hkv // 2, group, n, 2 * d)
    # all lanes carry the broadcast row total
    assert np.allclose(out[..., 0], out[..., -1])
    qn, kn = np.asarray(q), np.asarray(k)
    for p in range(hkv // 2):
        for g in range(group):
            hA = 2 * p * group + g        # packed A = q head of kv 2p
            hB = (2 * p + 1) * group + g  # packed B = q head of kv 2p+1
            want = (
                (qn[0, hA] @ kn[0, 2 * p].T).sum(-1)
                + (qn[0, hB] @ kn[0, 2 * p + 1].T).sum(-1)
            )
            np.testing.assert_allclose(
                out[0, p, g, :, 0], want, rtol=2e-4, atol=1e-2
            )
