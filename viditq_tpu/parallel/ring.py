"""Ring attention (context parallelism) over the sp mesh axis.

Beyond the reference (it ships Ulysses all-to-all only,
`t2v/opensora/acceleration/communications.py`): Ulysses caps the axis
size at the head count (H % sp == 0, stdit.py:82-86) and all-to-alls the
full sequence. Ring attention removes both limits — each device keeps its
q shard resident, k/v shards rotate around the ICI ring one neighbor per
step (`ppermute`), and softmax runs online (flash-style running max /
sum / rescaled accumulator), so per-device memory is O(N/sp) and any sp
size works regardless of H. The right tool for PixArt-Σ 2K/4K sequences
where Ulysses runs out of heads.

Math: for k/v blocks j = 0..S-1,
  m'   = max(m, rowmax(s_j))
  c    = exp(m - m')
  o    = o * c + exp(s_j - m') @ v_j
  r    = r * c + rowsum(exp(s_j - m'))
final out = o / r — identical to softmax(q k^T) v (oracle-tested vs sdpa).
"""

from __future__ import annotations

from typing import Optional

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _ring_attn_local(q, k, v, scale: float, axis_name: str):
    """Per-shard body: q/k/v [B, n_loc, H, D] (seq-sharded)."""
    S = jax.lax.axis_size(axis_name)
    B, n_loc, H, D = q.shape
    qf = q.astype(jnp.float32) * scale

    def scores(kb):
        # [B, n_loc, H, n_kv]
        return jnp.einsum("bqhd,bkhd->bqhk", qf, kb.astype(jnp.float32))

    o = jnp.zeros((B, n_loc, H, D), jnp.float32)
    m = jnp.full((B, n_loc, H, 1), -jnp.inf, jnp.float32)
    r = jnp.zeros((B, n_loc, H, 1), jnp.float32)
    kb, vb = k, v
    perm = [(d, (d + 1) % S) for d in range(S)]
    # S is static (the mesh axis size): unroll in python so the last step
    # skips the rotation (no wasted ICI hop) and XLA can overlap each
    # ppermute with the next block's compute
    for i in range(S):
        s = scores(kb)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        c = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new)
        o = o * c + jnp.einsum("bqhk,bkhd->bqhd",
                               e, vb.astype(jnp.float32))
        r = r * c + jnp.sum(e, axis=-1, keepdims=True)
        m = m_new
        if i < S - 1:
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
    return (o / r).astype(q.dtype)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = "sp",
                   scale: Optional[float] = None) -> jnp.ndarray:
    """q,k,v: [B, N, H, D] logically; sharded on N over `axis`.

    No head-divisibility constraint (unlike ulysses_attention); N must
    divide by the axis size. Returns [B, N, H, D] seq-sharded like the
    inputs.
    """
    sp = mesh.shape[axis]
    B, N, H, D = q.shape
    assert N % sp == 0, f"sequence {N} not divisible by sp={sp}"
    scale = D ** -0.5 if scale is None else scale
    spec = P(None, axis, None, None)
    fn = shard_map(
        functools.partial(_ring_attn_local, scale=scale, axis_name=axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)
