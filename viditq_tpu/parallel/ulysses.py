"""Ulysses-style sequence-parallel attention (all-to-all head scatter).

Reference: DeepSpeed-Ulysses pattern in `SeqParallelAttention`
(`t2v/opensora/models/layers/blocks.py:198-274`): q/k/v arrive sharded on
the sequence axis; an all-to-all converts seq-shard -> head-shard before
attention and back after. Here that is `jax.lax.all_to_all` inside
`shard_map` over the 'sp' mesh axis — the collectives ride ICI and XLA
overlaps them with compute.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from viditq_tpu.models.layers import sdpa


def _local_attn(q, k, v, scale, axis_name: str):
    """Runs per-shard: [B, N/sp, H, D] in, seq-sharded out.

    all_to_all(split heads -> gather seq): [B, N/sp, H, D] ->
    [B, N, H/sp, D] (blocks.py:232), attention, then the reverse (:267).
    """
    # scatter axis 2 (heads), gather axis 1 (sequence)
    q = jax.lax.all_to_all(q, axis_name, split_axis=2, concat_axis=1,
                           tiled=True)
    k = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1,
                           tiled=True)
    v = jax.lax.all_to_all(v, axis_name, split_axis=2, concat_axis=1,
                           tiled=True)
    from viditq_tpu.kernels.attention import attention_bnhd, attention_ok
    B, N, H_local, D = q.shape
    if attention_ok(N, H_local, D):
        # layout-native Pallas kernel on the head-sharded [B, N, H/sp, D]
        # block — same entry the single-chip path uses; shard_map hands it
        # purely local shapes so it composes without layout changes
        out = attention_bnhd(q, k, v, scale)
    else:
        # [B, N, H_local, D] -> [B, H_local, N, D]
        out = sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                   v.transpose(0, 2, 1, 3), scale)
        out = out.transpose(0, 2, 1, 3)  # [B, N, H_local, D]
    # gather heads, scatter sequence back
    out = jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2,
                             tiled=True)
    return out


def ulysses_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      mesh: Mesh, axis: str = "sp",
                      scale: Optional[float] = None) -> jnp.ndarray:
    """q,k,v: [B, N, H, D] logically; sharded on N over `axis`.

    H must be divisible by the axis size (stdit.py:82-86 asserts the dual
    constraint on d_t). Returns [B, N, H, D] seq-sharded like the inputs.
    """
    sp = mesh.shape[axis]
    B, N, H, D = q.shape
    assert H % sp == 0, f"heads {H} not divisible by sp={sp}"
    scale = D ** -0.5 if scale is None else scale
    spec = P(None, axis, None, None)
    fn = shard_map(
        functools.partial(_local_attn, scale=scale, axis_name=axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)


def sp_split(x: jnp.ndarray, mesh: Mesh, axis_dim: int = 1,
             axis: str = "sp") -> jnp.ndarray:
    """Annotate x as sequence-sharded (the functional analog of
    split_forward_gather_backward, stdit.py:261-262)."""
    spec = [None] * x.ndim
    spec[axis_dim] = axis
    return jax.lax.with_sharding_constraint(
        x, jax.sharding.NamedSharding(mesh, P(*spec)))


def sp_gather(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Gather back to replicated (stdit.py:331-332)."""
    return jax.lax.with_sharding_constraint(
        x, jax.sharding.NamedSharding(mesh, P()))
