"""DP x TP training step under shard_map (megatron-style, explicit collectives).

The reference has no training and no multi-device anything; this implements
the missing layer idiomatically: parameters tensor-sharded over "model"
(column-parallel qkv/gate/up, row-parallel o/down), batch sharded over
"data". Inside shard_map each device runs the Pallas flash-attention kernel
on its local heads; the only collectives are the two psums after the
row-parallel projections (attention out, MLP down) and the gradient pmean
over the data axis — all riding ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from flashattention_kernel_project_tpu.models import transformer as tfm
from flashattention_kernel_project_tpu.ops.flash_attention import flash_attention


def _tp_forward(cfg, params, tokens, *, model_axis, interpret=None):
    """Local-shard forward. Head counts come from the *local* array shapes
    (wq arrives column-sliced under shard_map)."""
    b, n = tokens.shape
    x = params["embed"][tokens]
    positions = jnp.arange(n)[None, :]
    sin, cos = tfm.rope_tables(cfg, positions)

    n_layers = params["layers"]["wq"].shape[0]
    for i in range(n_layers):
        layer = jax.tree.map(lambda p: p[i], params["layers"])
        hq_local = layer["wq"].shape[-1] // cfg.d_head
        hkv_local = layer["wk"].shape[-1] // cfg.d_head

        h = tfm.rms_norm(x, layer["rms_attn"])
        q = (h @ layer["wq"]).reshape(b, n, hq_local, cfg.d_head)
        k = (h @ layer["wk"]).reshape(b, n, hkv_local, cfg.d_head)
        v = (h @ layer["wv"]).reshape(b, n, hkv_local, cfg.d_head)
        q = tfm.apply_rope(q, sin, cos)
        k = tfm.apply_rope(k, sin, cos)
        o = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            causal=True,
            block_q=min(cfg.block_q, n),
            block_k=min(cfg.block_k, n),
            interpret=interpret,
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, n, hq_local * cfg.d_head)
        # row-parallel wo: partial sums -> psum over the model axis
        x = x + jax.lax.psum(o @ layer["wo"], model_axis)

        h2 = tfm.rms_norm(x, layer["rms_mlp"])
        gated = jax.nn.silu(h2 @ layer["w_gate"]) * (h2 @ layer["w_up"])
        x = x + jax.lax.psum(gated @ layer["w_down"], model_axis)

    x = tfm.rms_norm(x, params["rms_final"])
    return (x @ params["embed"].T).astype(jnp.float32)


def _tp_loss(cfg, params, tokens, *, model_axis, interpret=None):
    logits = _tp_forward(
        cfg, params, tokens, model_axis=model_axis, interpret=interpret
    )
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def make_train_step(
    cfg: tfm.TransformerConfig,
    mesh: Mesh,
    *,
    lr: float = 1e-3,
    data_axis: str = "data",
    model_axis: str = "model",
    interpret: bool | None = None,
):
    """Build the jitted DP x TP train step.

    Returns (step_fn(params, tokens) -> (new_params, loss), param_specs).
    `params` must be laid out per param_specs (parallel.mesh.shard_params).
    """
    rules = tfm.param_shardings(cfg, data_axis=data_axis, model_axis=model_axis)

    def _is_tp(spec: P) -> bool:
        return model_axis in [ax for ax in spec if ax is not None]

    def step(params, tokens):
        loss, grads = jax.value_and_grad(
            functools.partial(
                _tp_loss, cfg, model_axis=model_axis, interpret=interpret
            )
        )(params, tokens)
        # DP: average grads + loss over the data axis.
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, data_axis), grads)
        loss = jax.lax.pmean(loss, data_axis)
        # Replicated leaves (embed, norms): average over model to kill drift;
        # TP-sharded leaves are exclusively owned, leave them alone.
        grads = jax.tree.map(
            lambda g, spec: g if _is_tp(spec) else jax.lax.pmean(g, model_axis),
            grads,
            rules,
        )
        new_params = jax.tree.map(
            lambda p, g: (
                p.astype(jnp.float32) - lr * g.astype(jnp.float32)
            ).astype(p.dtype),
            params,
            grads,
        )
        return new_params, loss

    step_sm = shard_map(
        step,
        mesh=mesh,
        in_specs=(rules, P(data_axis, None)),
        out_specs=(rules, P()),
        check_vma=False,
    )
    return jax.jit(step_sm), rules
