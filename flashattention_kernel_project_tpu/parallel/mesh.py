"""Device mesh + tensor-parallel (head-sharded) attention wrappers.

The reference is single-GPU; its only "parallelism" is batchxhead grid
dimensions (SURVEY.md section 2.9). This layer is the designed-fresh
multi-chip story: a named Mesh, shard_map-wrapped kernels, and XLA
collectives over ICI. Head sharding follows the idiomatic
P(None, "model", ...) pattern (KV heads on the model axis), so the Pallas
kernels below run unchanged per shard — the mesh is purely a layout concern.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from flashattention_kernel_project_tpu.ops.flash_attention import flash_attention
from flashattention_kernel_project_tpu.ops.flash_decode import flash_decode


def make_mesh(
    axis_sizes: dict[str, int] | None = None,
    *,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a Mesh. Default: all devices on a single "model" axis.

    axis_sizes like {"data": 2, "model": 4}; a single -1 entry absorbs the
    remaining devices.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"model": n}
    names = tuple(axis_sizes)
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    assert int(np.prod(sizes)) == n, (sizes, n)
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def head_sharded_attention(
    mesh: Mesh,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    data_axis: str | None = "data",
    model_axis: str = "model",
    **kernel_kwargs,
):
    """shard_map-wrapped fused attention: KV heads on the model axis, batch
    on the data axis. Zero collectives in the forward — attention is
    embarrassingly parallel over heads; the surrounding projections own the
    all-reduces.

    Returns fn(q[B,Hq,N,D], k[B,Hkv,S,D], v) -> [B,Hq,N,Dv].
    """
    b_axis = data_axis if data_axis in mesh.axis_names else None
    spec = P(b_axis, model_axis, None, None)

    def _attn(q, k, v):
        return flash_attention(
            q, k, v, causal=causal, sm_scale=sm_scale, **kernel_kwargs
        )

    return jax.jit(
        shard_map(
            _attn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )
    )


def head_sharded_decode(
    mesh: Mesh,
    *,
    n_splits: int = 8,
    sm_scale: float | None = None,
    data_axis: str | None = "data",
    model_axis: str = "model",
    **kernel_kwargs,
):
    """shard_map-wrapped split-KV decode: the KV cache is tensor-sharded over
    KV heads (P(batch, "model", None, None)) so each chip streams only its
    slice of the cache — the multi-chip version of the reference's
    grid-over-heads batching.

    Returns fn(q[B,Hq,D], k_cache, v_cache, lengths[B]) -> [B,Hq,D].
    """
    b_axis = data_axis if data_axis in mesh.axis_names else None
    q_spec = P(b_axis, model_axis, None)
    kv_spec = P(b_axis, model_axis, None, None)
    len_spec = P(b_axis)

    def _decode(q, k_cache, v_cache, lengths):
        return flash_decode(
            q, k_cache, v_cache, lengths,
            n_splits=n_splits, sm_scale=sm_scale, **kernel_kwargs,
        )

    return jax.jit(
        shard_map(
            _decode,
            mesh=mesh,
            in_specs=(q_spec, kv_spec, kv_spec, len_spec),
            out_specs=q_spec,
            check_vma=False,
        )
    )


def shard_params(params, mesh: Mesh, rules) -> object:
    """Apply a pytree of PartitionSpecs to a matching pytree of arrays."""
    return jax.tree.map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        params,
        rules,
    )


def head_sharded_decode_quant(
    mesh: Mesh,
    *,
    n_splits: int = 8,
    sm_scale: float | None = None,
    data_axis: str | None = "data",
    model_axis: str = "model",
    **kernel_kwargs,
):
    """head_sharded_decode against an 8-bit KV cache: each chip streams its
    int8/fp8 head slice (values + per-token scales) through the
    fused-dequant split-KV kernel — half the per-chip HBM traffic of the
    bf16 TP decode, completing the BASELINE north star's "quantized KV
    tensor-sharded over the mesh" decode path.

    Returns fn(q[B,Hq,D], k_q[B,Hkv,S,D] 8-bit, k_scale[B,Hkv,S,1],
    v_q, v_scale, lengths[B]) -> [B,Hq,D].
    """
    from flashattention_kernel_project_tpu.ops.flash_decode import (
        flash_decode_int8,
    )

    b_axis = data_axis if data_axis in mesh.axis_names else None
    q_spec = P(b_axis, model_axis, None)
    kv_spec = P(b_axis, model_axis, None, None)
    len_spec = P(b_axis)

    def _decode(q, k_q, k_s, v_q, v_s, lengths):
        return flash_decode_int8(
            q, k_q, k_s, v_q, v_s, lengths,
            n_splits=n_splits, sm_scale=sm_scale, **kernel_kwargs,
        )

    return jax.jit(
        shard_map(
            _decode,
            mesh=mesh,
            in_specs=(q_spec, kv_spec, kv_spec, kv_spec, kv_spec, len_spec),
            out_specs=q_spec,
            check_vma=False,
        )
    )
