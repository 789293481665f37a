"""Device mesh + sharding rules.

TPU-native replacement for the reference's process-group registry and
ColossalAI plugin (`t2v/opensora/acceleration/parallel_states.py`,
`plugin.py:14-66`): one `jax.sharding.Mesh` with named axes
  dp — data parallel (ZeRO-style batch sharding, plugin.py)
  sp — sequence parallel (Ulysses all-to-all, blocks.py:198-360)
  tp — tensor parallel (absent in the reference — t5_encoder.py:8 asserts it
       off — provided here as the idiomatic pjit weight sharding)
Collectives are XLA/GSPMD over ICI; there are no NCCL-style explicit comm
wrappers (communications.py) — `shard_map` + `jax.lax.all_to_all` covers the
Ulysses path (viditq_tpu.parallel.ulysses).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, sp: int = 1, tp: int = 1, pp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = dp * sp * tp * pp
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, sp, tp, pp)
    return Mesh(arr, ("dp", "sp", "tp", "pp"))


def param_sharding_rules(path_str: str) -> P:
    """Megatron-style TP weight sharding for DiT blocks.

    qkv/fc1 kernels [C_in, C_out] split on the output dim, proj/fc2 on the
    input dim; everything else replicated. With tp=1 these all collapse to
    replication.
    """
    col = ("/q/", "/k/", "/v/", "/fc1/", "/q_linear/", "/kv_linear/")
    row = ("/proj/", "/fc2/")
    p = "/" + path_str.strip("/") + "/"
    if "/blocks" not in p and not p.startswith("/blocks"):
        return P()
    if any(c in p for c in col) and p.endswith("/kernel/"):
        return P(None, "tp")
    if any(r in p for r in row) and p.endswith("/kernel/"):
        return P("tp", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Apply param_sharding_rules across a params pytree."""
    from flax import traverse_util
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, val in flat.items():
        spec = param_sharding_rules("/".join(path) + "/")
        if len(spec) > getattr(val, "ndim", 0):
            spec = P()
        out[path] = jax.device_put(val, NamedSharding(mesh, spec))
    return traverse_util.unflatten_dict(out)


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[batch_axis] = "dp"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
