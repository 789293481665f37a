"""Sampling pipelines: FP baseline, calib-trajectory capture, quant inference.

Mirrors the reference entry points `t2v/scripts/{inference,get_calib_data,
quant_txt2video}.py` / `t2i/scripts/{inference,get_calib_data,
quant_txt2img}.py` as library functions over (model, variables, sampler).
Text embeds are precomputed ([cond; null] layout, reference
get_text_embeds.py) — the default path for every quant flow.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from viditq_tpu.quant.qlinear import QuantCtx
from viditq_tpu.samplers.iddpm import default_qctx_factory


def make_model_apply(model, variables):
    """Bind variables: (x, t, y, mask, qctx) -> model output."""
    def apply_fn(x, t, y, mask, qctx):
        return model.apply(variables, x, t, y, mask, qctx=qctx)
    return apply_fn


def fp_sample(model, variables, sampler, z, y, mask=None, rng=None,
              sampler_type: str = "ddim", jit: bool = True):
    """FP16/BF16 baseline generation (reference inference.py)."""
    model_apply = make_model_apply(model, variables)

    def run(z, y, mask):
        kwargs = dict(rng=rng)
        if hasattr(sampler, "schedule"):
            kwargs["sampler_type"] = sampler_type
        return sampler.sample(model_apply, z, y, mask, **kwargs)
    return (jax.jit(run) if jit else run)(z, y, mask)


def get_calib_data(model, variables, sampler, z, y, mask=None, rng=None,
                   sampler_type: str = "ddim", jit: bool = True) -> Dict:
    """FP sampling with trajectory capture -> calib_data dict
    {xs, ts, y, mask} (reference get_calib_data.py:24-145; xs/ts stacked
    [n_steps, 2B, ...])."""
    model_apply = make_model_apply(model, variables)

    def run(z, y, mask):
        kwargs = dict(rng=rng, return_trajectory=True)
        if hasattr(sampler, "schedule"):
            kwargs["sampler_type"] = sampler_type
        return sampler.sample(model_apply, z, y, mask, **kwargs)

    samples, traj = (jax.jit(run) if jit else run)(z, y, mask)
    xs, ts = traj["xs"], traj["ts"]
    if xs.shape[1] == z.shape[0]:
        # dpm-solver trajectories are single-batch (no CFG doubling);
        # duplicate to the [cond; null] layout PTQ forwards expect.
        xs = jnp.concatenate([xs, xs], axis=1)
        ts = jnp.concatenate([ts, ts], axis=1)
    return {"samples": samples, "xs": xs, "ts": ts, "y": y, "mask": mask}


def quant_sample(model, variables, sampler, z, y, mask=None, rng=None,
                 act_slot_map: Optional[np.ndarray] = None,
                 sampler_type: str = "ddim", mode: str = "quant",
                 jit: bool = True):
    """Quantized inference (reference quant_txt2video.py:29-237): the whole
    denoise loop jits as one program; per-step quant state is index lookups
    inside the scan."""
    model_apply = make_model_apply(model, variables)
    qctx_factory = default_qctx_factory(mode=mode, act_slot_map=act_slot_map)

    def run(z, y, mask):
        kwargs = dict(rng=rng, qctx_factory=qctx_factory)
        if hasattr(sampler, "schedule"):
            kwargs["sampler_type"] = sampler_type
        return sampler.sample(model_apply, z, y, mask, **kwargs)
    return (jax.jit(run) if jit else run)(z, y, mask)
