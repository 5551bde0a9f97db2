"""Checkpoint/resume: params + opt state + step survive a save/restore
round-trip, including restore onto a sharded mesh template (SURVEY.md
section 5.4 — absent in the reference; required for a serving/training
framework)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from flashattention_kernel_project_tpu import models, parallel


@pytest.fixture
def cfg():
    return models.TransformerConfig(
        vocab_size=64, d_model=32, n_layers=2, n_heads=4, n_kv_heads=2,
        d_head=8, d_ff=64, dtype=jnp.float32, block_q=16, block_k=16,
    )


def test_checkpoint_roundtrip(tmp_path, cfg):
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    path = models.save_checkpoint(
        str(tmp_path / "ck"), params, step=7, opt_state=opt_state, config=cfg
    )
    got = models.restore_checkpoint(
        path, params_template=params, opt_state_template=opt_state
    )
    assert got["step"] == 7
    assert got["config"]["d_model"] == 32
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(opt_state), jax.tree.leaves(got["opt_state"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_restore_sharded(tmp_path, cfg):
    """Restore directly into a mesh-sharded layout via an abstract template."""
    params = models.init_params(cfg, jax.random.PRNGKey(1))
    path = models.save_checkpoint(str(tmp_path / "ck"), params, step=1)

    mesh = parallel.make_mesh({"data": 2, "model": 4})
    from flashattention_kernel_project_tpu.models import transformer as tfm
    rules = tfm.param_shardings(cfg, data_axis="data", model_axis="model")
    template = jax.tree.map(
        lambda p, rule: jax.ShapeDtypeStruct(
            p.shape, p.dtype,
            sharding=jax.sharding.NamedSharding(mesh, rule),
        ),
        params, rules,
    )
    got = models.restore_checkpoint(path, params_template=template)
    restored = got["params"]
    leaf = jax.tree.leaves(restored)[0]
    assert isinstance(leaf.sharding, jax.sharding.NamedSharding)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_only_restore_from_training_checkpoint(tmp_path, cfg):
    """The serving case: restore ONLY params from a checkpoint that was
    saved with optimizer state (regression: a single-item tree made this a
    structure mismatch)."""
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    opt_state = optax.adam(1e-3).init(params)
    path = models.save_checkpoint(
        str(tmp_path / "ck"), params, step=5, opt_state=opt_state
    )
    got = models.restore_checkpoint(path, params_template=params)
    assert "opt_state" in got  # present on disk -> still returned
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
