"""Workload config: python config files + model/sampler construction.

Reference config system (SURVEY §1 L6): mmengine python configs for the
model/inference side (`t2v/configs/opensora/inference/16x512x512.py`) merged
with argparse (`t2v/opensora/utils/config_utils.py:259-263`). Here a python
config file is exec'd into a plain dict (same `model = dict(type=...)`
syntax works) and CLI args overwrite top-level keys.
"""

from __future__ import annotations

import runpy
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from viditq_tpu.models import MODELS, SCHEDULERS, build_module
from viditq_tpu.models.vae import VideoAutoencoderKL, AutoencoderKL


_DTYPES = {"fp16": jnp.bfloat16, "bf16": jnp.bfloat16, "fp32": jnp.float32,
           "float16": jnp.bfloat16, "float32": jnp.float32}


def load_py_config(path: str) -> Dict[str, Any]:
    ns = runpy.run_path(path)
    return {k: v for k, v in ns.items() if not k.startswith("_")}


def merge_args(cfg: Dict[str, Any], args) -> Dict[str, Any]:
    """argparse wins over the config file (config_utils.py:182-213)."""
    cfg = dict(cfg)
    for k, v in vars(args).items():
        if v is not None:
            cfg[k] = v
    return cfg


def model_dtype(cfg: Dict[str, Any]):
    return _DTYPES.get(str(cfg.get("dtype", "bf16")).lower(), jnp.bfloat16)


def latent_size(cfg: Dict[str, Any]) -> Tuple[int, ...]:
    if "num_frames" in cfg:  # video workload
        t = cfg["num_frames"]
        h, w = cfg.get("image_size", (512, 512))
        return (t, h // 8, w // 8)
    size = cfg.get("image_size", 512)
    if isinstance(size, (tuple, list)):
        size = size[0]
    return (size // 8, size // 8)


def build_model(cfg: Dict[str, Any], resolver=None, dtype=None):
    mcfg = dict(cfg["model"])
    mcfg.pop("from_pretrained", None)
    mcfg.pop("enable_flashattn", None)
    mcfg.pop("enable_layernorm_kernel", None)
    ls = latent_size(cfg)
    if len(ls) == 3:
        mcfg.setdefault("input_size", ls)
    else:
        mcfg.setdefault("input_size", ls[0])
    if resolver is not None:
        mcfg["resolver"] = resolver
    mcfg["dtype"] = dtype or model_dtype(cfg)
    return build_module(mcfg, MODELS)


def build_sampler(cfg: Dict[str, Any], cfg_split: bool = False,
                  override_type: str = None):
    # registration side effect: samplers register themselves on import;
    # without this a fresh process (e.g. `cli ptq` standalone) sees an
    # empty SCHEDULERS registry
    import viditq_tpu.samplers  # noqa: F401

    scfg = dict(cfg.get("scheduler", {"type": "iddpm"}))
    scfg.setdefault("cfg_scale", 4.0)
    # --sampler_type on the CLI (reference t2i quant_txt2img.py:138-182
    # sampler dispatch): 'ddim'/'iddpm' stay inside the config's IDDPM
    # wrapper; solver names replace the scheduler, keeping the config's
    # step/scale settings when the types differ.
    alias = {"dpms": "dpm-solver", "dpm-solver": "dpm-solver",
             "sa-solver": "sa-solver", "lcm": "lcm", "edm": "edm"}
    if override_type in alias:
        target = alias[override_type]
        if scfg.get("type") != target:
            scfg = {"type": target,
                    **{k: scfg[k] for k in
                       ("num_sampling_steps", "cfg_scale", "in_channels")
                       if k in scfg}}
        scfg.setdefault("cfg_scale", 4.0)
    if scfg.get("type", "iddpm") in ("iddpm", "dpm-solver"):
        scfg["cfg_split"] = cfg_split
    return build_module(scfg, SCHEDULERS)


def build_vae(cfg: Dict[str, Any]):
    vcfg = dict(cfg.get("vae", {"type": "VideoAutoencoderKL"}))
    kind = vcfg.pop("type", "VideoAutoencoderKL")
    vcfg.pop("from_pretrained", None)
    if kind == "VideoAutoencoderKL":
        return VideoAutoencoderKL(
            micro_batch_size=vcfg.get("micro_batch_size"))
    if kind == "VideoAutoencoderKLTemporalDecoder":
        # reference t2v vae.py:61-83 (SVD temporal decoder, decode-only)
        from viditq_tpu.models.vae import VideoAutoencoderKLTemporalDecoder
        num_frames = cfg.get("num_frames", 16)
        return VideoAutoencoderKLTemporalDecoder(num_frames=num_frames)
    return AutoencoderKL()
