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
