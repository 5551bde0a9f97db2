"""Ring / context-parallel attention over a sequence-sharded KV axis.

The mathematical core is the reference's associative streaming merge
(flashattn_streaming_16x16.cu:15-24): any partition of the key axis can be
attended independently and combined. The reference only ever partitioned
*within* one chip (16-wide tiles); here the partition is ACROSS chips — each
device holds one KV shard, shards rotate around the ring via ppermute, and
partials merge in normalized (o, lse) form:

  lse = logaddexp(lse_a, lse_b)
  o   = o_a * exp(lse_a - lse) + o_b * exp(lse_b - lse)

The rotation is issued *before* the local attention compute so XLA can
overlap the ICI transfer with the Pallas kernel — the inter-chip version of
the reference's load(t)/compute(t-1) software pipeline
(flashattn_forward_wmma_v5_cp_async.cu:221-251).

Causal scheduling: at step t, device i attends KV shard j = (i - t) mod P.
t = 0 is the diagonal (local causal attention, static for every device);
t >= 1 contributes only where j < i, i.e. i >= t, predicated with lax.cond.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from flashattention_kernel_project_tpu.ops.flash_attention import (
    flash_attention_with_lse,
)
from flashattention_kernel_project_tpu.ops.softmax import NEG_INF


def merge_normalized(o_a, lse_a, o_b, lse_b):
    """Merge two normalized attention partials (numerically safe for
    NEG_INF-lse empty partials)."""
    lse = jnp.logaddexp(lse_a, lse_b)
    wa = jnp.exp(lse_a - lse)[..., None]
    wb = jnp.exp(lse_b - lse)[..., None]
    return o_a * wa + o_b * wb, lse


def _make_ring(mesh, attend, n_kv, *, causal, seq_axis, data_axis):
    """Shared ring driver: `attend(q, kv_tuple, local_causal)` runs the local
    fused kernel and returns (o_f32, lse); `kv_tuple` is any pytree of
    n_kv sequence-sharded arrays that rotates around the ppermute ring as
    one unit (bf16 K/V, or 8-bit values + per-token scales)."""
    n_ring = mesh.shape[seq_axis]
    b_axis = data_axis if (data_axis and data_axis in mesh.axis_names) else None
    spec = P(b_axis, None, seq_axis, None)

    def _ring(q, *kv):
        idx = jax.lax.axis_index(seq_axis)
        perm = [(d, (d + 1) % n_ring) for d in range(n_ring)]

        # Step 0: the diagonal shard — local causal (or plain) attention.
        o, lse = attend(q, kv, local_causal=causal)

        dv = kv[-2].shape[-1] if n_kv == 4 else kv[-1].shape[-1]
        for t in range(1, n_ring):
            # rotate first so the ICI hop overlaps the local compute below
            kv_next = jax.lax.ppermute(kv, seq_axis, perm)

            if causal:
                # shard j = idx - t (mod n_ring) is strictly below the
                # diagonal only when idx >= t; wrapped shards are future
                # tokens and contribute nothing.
                def _attend(q=q, kv_next=kv_next):
                    return attend(q, kv_next, local_causal=False)

                def _skip(q=q):
                    return (
                        jnp.zeros(q.shape[:-1] + (dv,), jnp.float32),
                        jnp.full(q.shape[:-1], NEG_INF, jnp.float32),
                    )

                o_t, lse_t = jax.lax.cond(idx >= t, _attend, _skip)
            else:
                o_t, lse_t = attend(q, kv_next, local_causal=False)

            o, lse = merge_normalized(o, lse, o_t, lse_t)
            kv = kv_next

        return o.astype(q.dtype)

    return jax.jit(
        shard_map(
            _ring, mesh=mesh, in_specs=(spec,) * (1 + n_kv), out_specs=spec,
            check_vma=False,
        )
    )


def ring_attention(
    mesh: Mesh,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    seq_axis: str = "sp",
    data_axis: str | None = "data",
    **kernel_kwargs,
):
    """Context-parallel attention: q, k, v sequence-sharded over `seq_axis`.

    Returns fn(q[B,H,N,D], k[B,H,S,D], v) -> [B,H,N,Dv] where N and S are
    GLOBAL lengths (shard_map slices them). Requires N and S divisible by the
    ring size. Causal assumes q and kv use the same sequence partition.
    """

    def attend(q, kv, *, local_causal):
        k, v = kv
        o, lse = flash_attention_with_lse(
            q, k, v, causal=local_causal, sm_scale=sm_scale, **kernel_kwargs,
        )
        return o.astype(jnp.float32), lse

    return _make_ring(
        mesh, attend, 2, causal=causal, seq_axis=seq_axis, data_axis=data_axis
    )


def ring_attention_kv_quant(
    mesh: Mesh,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    seq_axis: str = "sp",
    data_axis: str | None = "data",
    **kernel_kwargs,
):
    """Ring attention over an 8-bit (int8/fp8) sequence-sharded KV cache.

    BASELINE config 5's shape: long-context INT8 KV sharded over the mesh.
    Identical ring schedule to ring_attention, but each device holds and
    ROTATES the quantized shard (values + per-token scales) — half the ICI
    bytes per hop vs bf16 — and attends through the fused-dequant kernel
    (ops.flash_attention_kv_quant_with_lse), so the shard is never
    materialized in full precision anywhere.

    Returns fn(q[B,Hq,N,D], k_q[B,Hkv,S,D] 8-bit, k_scale[B,Hkv,S,1],
    v_q, v_scale) -> [B,Hq,N,Dv] (global lengths; shard_map slices).
    """
    from flashattention_kernel_project_tpu.ops.flash_attention import (
        flash_attention_kv_quant_with_lse,
    )

    def attend(q, kv, *, local_causal):
        kq, ks, vq, vs = kv
        o, lse = flash_attention_kv_quant_with_lse(
            q, kq, ks, vq, vs, causal=local_causal, sm_scale=sm_scale,
            **kernel_kwargs,
        )
        return o.astype(jnp.float32), lse

    return _make_ring(
        mesh, attend, 4, causal=causal, seq_axis=seq_axis, data_axis=data_axis
    )
