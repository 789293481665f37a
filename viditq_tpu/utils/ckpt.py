"""Checkpoint conversion and (de)serialization.

* torch `.pth` state-dict -> flax params for STDiT / PixArt, including the
  fused-qkv split the reference performs at load
  (`t2v/scripts/split_ckpt.py:3-25`, `stdit.py:460-483`).
* framework-native checkpoints: msgpack via flax.serialization for params,
  npz for quant-param dicts (the reference's quant ckpt format equivalent,
  `quant_model.py:220-269`).

torch is used only to deserialize `.pth` files (CPU); everything downstream
is numpy/JAX.
"""

from __future__ import annotations

import io
import os
import pickle
from typing import Dict, Mapping, Optional

import jax
import numpy as np
from flax import serialization, traverse_util

from viditq_tpu.quant.calibrate import quant_params_dict, load_quant_params_dict


def _t(x):
    return np.asarray(x).T


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    if "ema" in sd and isinstance(sd["ema"], dict):
        sd = sd["ema"]
    return {k: _np(v) for k, v in sd.items()}


def split_qkv(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Split fused `*.qkv.{weight,bias}` into q/k/v (split_ckpt.py:3-25:
    weight reshaped [3, D, D] then unbound)."""
    out = {}
    for k, v in sd.items():
        if k.endswith(".qkv.weight"):
            d = v.shape[-1]
            for name, w in zip("qkv", v.reshape(3, d, d)):
                out[k.replace(".qkv.weight", f".{name}.weight")] = w
        elif k.endswith(".qkv.bias"):
            d = v.shape[-1] // 3
            for name, b in zip("qkv", v.reshape(3, d)):
                out[k.replace(".qkv.bias", f".{name}.bias")] = b
        else:
            out[k] = v
    return out


# torch module-path suffix -> flax path suffix rewrites shared by both models
_COMMON_RENAMES = {
    "t_embedder.mlp.0": "t_embedder.fc1",
    "t_embedder.mlp.2": "t_embedder.fc2",
    "t_block.1": "t_block.linear",
    "y_embedder.y_proj.fc1": "y_embedder.fc1",
    "y_embedder.y_proj.fc2": "y_embedder.fc2",
    "csize_embedder.mlp.0": "csize_embedder.fc1",
    "csize_embedder.mlp.2": "csize_embedder.fc2",
    "ar_embedder.mlp.0": "ar_embedder.fc1",
    "ar_embedder.mlp.2": "ar_embedder.fc2",
}

# recomputed constants (sincos position tables, dit.py:122-123)
_SKIP_KEYS = ("pos_embed", "pos_embed_temporal", "pos_embed_spatial")


def _flax_path(torch_key: str) -> Optional[tuple]:
    """Map a torch parameter key to our flax params path."""
    for pre, post in _COMMON_RENAMES.items():
        if torch_key.startswith(pre + "."):
            torch_key = post + torch_key[len(pre):]
    parts = torch_key.split(".")
    if parts[0] in _SKIP_KEYS:
        return None
    # blocks.N.x -> blocks_N.x
    if parts[0] == "blocks" and parts[1].isdigit():
        parts = [f"blocks_{parts[1]}"] + parts[2:]
    # DiT-family adaLN-Zero heads: Sequential(SiLU, Linear) -> adaLN_linear
    # (dit.py:66, blocks.py:373)
    for i, p in enumerate(parts):
        if p == "adaLN_modulation":
            parts = parts[:i] + ["adaLN_linear"] + parts[i + 2:]
            break
    # LabelEmbedder nn.Embedding table (blocks.py:455) -> 'embedding' param,
    # NOT a linear kernel (no transpose)
    if parts[-2:] == ["embedding_table", "weight"]:
        return tuple(parts[:-2] + ["embedding"])
    leaf = parts[-1]
    if leaf == "weight":
        parts[-1] = "kernel"
    return tuple(parts)


def convert_dit_checkpoint(sd: Mapping[str, np.ndarray],
                           conv_paths=("x_embedder.proj", ".sr"),
                           norm_paths=("q_norm", "k_norm", "norm")
                           ) -> Dict:
    """Generic torch->flax conversion for our DiT-family modules.

    - fused qkv split first
    - Linear weight [out, in] -> kernel [in, out]
    - ConvNd weight [out, in, *k] -> kernel [*k, in, out]
    - affine LayerNorm weight/bias -> scale/bias
    """
    sd = split_qkv(dict(sd))
    flat: Dict[tuple, np.ndarray] = {}
    for key, val in sd.items():
        path = _flax_path(key)
        if path is None:
            continue
        base = ".".join(key.split(".")[:-1])
        is_conv = any(base.endswith(c) or c in base for c in conv_paths) \
            and val.ndim >= 3
        is_norm = any(p in key.split(".") for p in norm_paths)
        if path[-1] == "kernel":
            if is_conv:
                # [O, I, *k] -> [*k, I, O]
                axes = tuple(range(2, val.ndim)) + (1, 0)
                val = val.transpose(axes)
            elif is_norm:
                path = path[:-1] + ("scale",)
            elif val.ndim == 2:
                val = val.T
        flat[path] = np.asarray(val, np.float32)
    return traverse_util.unflatten_dict(flat)


def convert_stdit_checkpoint(path_or_sd) -> Dict:
    sd = (load_torch_state_dict(path_or_sd)
          if isinstance(path_or_sd, (str, os.PathLike)) else path_or_sd)
    return convert_dit_checkpoint(sd)


def convert_pixart_checkpoint(path_or_sd) -> Dict:
    sd = (load_torch_state_dict(path_or_sd)
          if isinstance(path_or_sd, (str, os.PathLike)) else path_or_sd)
    return convert_dit_checkpoint(sd)


def stack_block_params(tree: Dict, depth: int, key: str = "blocks") -> Dict:
    """Convert per-block `blocks_i/...` subtrees into the stacked `blocks/...`
    layout used by scan_blocks models (leading depth axis)."""
    out = {k: v for k, v in tree.items() if not k.startswith(f"{key}_")}
    blocks = [tree[f"{key}_{i}"] for i in range(depth)]
    from jax import tree as jtree
    out[key] = jtree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                         *blocks)
    return out


def unstack_block_params(tree: Dict, key: str = "blocks") -> Dict:
    """Inverse of stack_block_params."""
    out = {k: v for k, v in tree.items() if k != key}
    stacked = tree[key]
    from flax import traverse_util as tu
    flat = tu.flatten_dict(stacked)
    depth = next(iter(flat.values())).shape[0]
    for i in range(depth):
        out[f"{key}_{i}"] = tu.unflatten_dict(
            {p: np.asarray(v)[i] for p, v in flat.items()})
    return out


# ---------------- framework-native (de)serialization ----------------

def save_params(path: str, params: Dict):
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template: Dict) -> Dict:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_train_state(path: str, params: Dict, ema: Dict, opt_state,
                     meta: Optional[Dict] = None):
    """Full resumable training checkpoint (role of the reference booster
    `save` in ckpt_utils.py: model + ema + optimizer + epoch/step/sampler
    counters, train.py:243-257): one msgpack tree + a JSON meta sidecar
    `<path>.meta.json` holding the python-side counters."""
    import json

    state = {"params": jax.tree.map(np.asarray, params),
             "ema": jax.tree.map(np.asarray, ema),
             "opt_state": jax.tree.map(np.asarray, opt_state)}
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    with open(path + ".meta.json", "w") as f:
        json.dump(meta or {}, f)


def load_train_state(path: str, params_template: Dict,
                     opt_state_template) -> tuple:
    """Returns (params, ema, opt_state, meta). Templates supply the pytree
    structure (build them with model.init + optimizer.init)."""
    import json

    target = {"params": params_template, "ema": params_template,
              "opt_state": opt_state_template}
    with open(path, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return state["params"], state["ema"], state["opt_state"], meta


def save_train_state_orbax(path_dir: str, params: Dict, ema: Dict,
                           opt_state, meta: Optional[Dict] = None,
                           async_save: bool = True):
    """Orbax-backed train-state checkpoint: sharded-array aware (each host
    writes its shards — the multi-chip production path the msgpack format
    can't do) and async by default (the save overlaps the next train
    steps; call wait_for_orbax_saves() before exiting). Directory format;
    meta goes to <dir>.meta.json like save_train_state."""
    import json

    import orbax.checkpoint as ocp

    path_dir = os.path.abspath(path_dir)
    state = {"params": params, "ema": ema, "opt_state": opt_state}
    ckptr = _orbax_checkpointer(async_save)
    ckptr.save(path_dir, state, force=True)
    with open(path_dir + ".meta.json", "w") as f:
        json.dump(meta or {}, f)


def load_train_state_orbax(path_dir: str, params_template: Dict,
                           opt_state_template) -> tuple:
    import json

    import orbax.checkpoint as ocp

    path_dir = os.path.abspath(path_dir)
    target = {"params": params_template, "ema": params_template,
              "opt_state": opt_state_template}
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path_dir, target=target)
    meta = {}
    if os.path.exists(path_dir + ".meta.json"):
        with open(path_dir + ".meta.json") as f:
            meta = json.load(f)
    return state["params"], state["ema"], state["opt_state"], meta


_ORBAX_ASYNC = None


def _orbax_checkpointer(async_save: bool):
    import orbax.checkpoint as ocp

    global _ORBAX_ASYNC
    if not async_save:
        return ocp.StandardCheckpointer()
    if _ORBAX_ASYNC is None:
        _ORBAX_ASYNC = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())
    return _ORBAX_ASYNC


def wait_for_orbax_saves():
    """Block until pending async checkpoint writes land (call before
    process exit or before reading a just-written checkpoint)."""
    if _ORBAX_ASYNC is not None:
        _ORBAX_ASYNC.wait_until_finished()


def save_quant_ckpt(path: str, quant_vars: Dict, meta: Optional[Dict] = None):
    """Quant-param checkpoint: {dotted_layer_name: {table: array}} + meta
    (act_slot_map, calib timesteps, plan name ...) — role of the reference's
    ckpt.pth (ptq.py:446-448)."""
    packed = quant_params_dict(quant_vars)
    flat = {f"{name}::{k}": np.asarray(v)
            for name, tabs in packed.items() for k, v in tabs.items()}
    if meta:
        flat["__meta__"] = np.frombuffer(pickle.dumps(meta), np.uint8)
    np.savez(path, **flat)


def load_quant_ckpt(path: str, quant_vars: Dict) -> tuple:
    """Load into an existing 'quant' collection skeleton. Returns
    (quant_vars, meta)."""
    data = np.load(path, allow_pickle=False)
    packed: Dict[str, Dict[str, np.ndarray]] = {}
    meta = None
    for key in data.files:
        if key == "__meta__":
            meta = pickle.loads(data[key].tobytes())
            continue
        name, tab = key.split("::")
        packed.setdefault(name, {})[tab] = data[key]
    return load_quant_params_dict(quant_vars, packed), meta


def stack_block_params_runs(tree: Dict, runs, key: str = "blocks") -> Dict:
    """stack_block_params for a stack scanned in contiguous uniform runs
    (PixArt-Σ KV compression under scan_blocks): `runs` is a list of
    (start, length); run j stacks blocks [start, start+length) under
    `{key}_{start}` (single run keeps the plain `{key}` name) — the
    container name carries the run's start offset so quant-table fills
    resolve the same unrolled-style per-block names the runtime uses
    (calibrate.scanned_block_names)."""
    if len(runs) == 1:
        return stack_block_params(tree, runs[0][1], key)
    from jax import tree as jtree
    out = {k: v for k, v in tree.items() if not k.startswith(f"{key}_")}
    for start, length in runs:
        blocks = [tree[f"{key}_{start + i}"] for i in range(length)]
        out[f"{key}_{start}"] = jtree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *blocks)
    return out
