"""DP x TP training step on the virtual 8-device mesh: numerics must match
the single-device train step, and loss must decrease."""

import jax
import jax.numpy as jnp
import numpy as np

from flashattention_kernel_project_tpu import models, parallel

CFG = models.TransformerConfig(
    vocab_size=64,
    d_model=64,
    n_layers=2,
    n_heads=8,
    n_kv_heads=4,
    d_head=16,
    d_ff=128,
    dtype=jnp.float32,
    block_q=32,
    block_k=32,
)


def test_tp_dp_step_matches_single_device():
    params = models.init_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 0, CFG.vocab_size)

    mesh = parallel.make_mesh({"data": 2, "model": 4})
    step, rules = parallel.make_train_step(CFG, mesh, lr=1e-2)
    sharded = parallel.shard_params(params, mesh, rules)
    new_sharded, loss_tp = step(sharded, tokens)

    new_single, loss_single = models.sgd_train_step(CFG, params, tokens, lr=1e-2)
    np.testing.assert_allclose(float(loss_tp), float(loss_single), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(new_sharded), jax.tree.leaves(new_single)):
        # collective reduction order differs from single-device accumulation;
        # bound the absolute drift (elements are O(1e-1))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4
        )


def test_tp_dp_loss_decreases():
    params = models.init_params(CFG, jax.random.PRNGKey(2))
    tokens = jax.random.randint(jax.random.PRNGKey(3), (4, 32), 0, CFG.vocab_size)
    mesh = parallel.make_mesh({"data": 2, "model": 4})
    step, rules = parallel.make_train_step(CFG, mesh, lr=5e-2)
    p = parallel.shard_params(params, mesh, rules)
    losses = []
    for _ in range(4):
        p, loss = step(p, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_cp_step_matches_single_device():
    """Context-parallel (sequence-sharded ring) train step == single-device
    step: same loss, same updated params."""
    params = models.init_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(
        jax.random.PRNGKey(2), (2, 64), 0, CFG.vocab_size
    )

    mesh = parallel.make_mesh({"sp": 4}, devices=jax.devices()[:4])
    step, rules = parallel.make_cp_train_step(CFG, mesh, lr=1e-2)
    sharded = parallel.shard_params(params, mesh, rules)
    new_cp, loss_cp = step(sharded, tokens)

    new_single, loss_single = models.sgd_train_step(CFG, params, tokens, lr=1e-2)
    np.testing.assert_allclose(float(loss_cp), float(loss_single), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(new_cp), jax.tree.leaves(new_single)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4
        )


def test_cp_step_loss_decreases():
    params = models.init_params(CFG, jax.random.PRNGKey(3))
    tokens = jax.random.randint(
        jax.random.PRNGKey(4), (2, 64), 0, CFG.vocab_size
    )
    mesh = parallel.make_mesh({"sp": 4}, devices=jax.devices()[:4])
    step, rules = parallel.make_cp_train_step(CFG, mesh, lr=1e-1)
    p = parallel.shard_params(params, mesh, rules)
    _, loss0 = step(p, tokens)
    for _ in range(3):
        p, loss = step(p, tokens)
    assert float(loss) < float(loss0)
