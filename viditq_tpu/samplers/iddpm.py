"""IDDPM scheduler wrapper: CFG sampling + calibration-trajectory capture.

Reference: `t2v/opensora/schedulers/iddpm/__init__.py` (IDDPM.sample,
forward_with_cfg). The CFG batch layout is preserved: z is doubled, y is
[cond; null] along batch, and eps is mixed as uncond + s*(cond - uncond).
`cfg_split=True` runs cond/uncond as separate forwards so dynamic per-token
quant params differ per branch (iddpm/__init__.py:140-159).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from viditq_tpu.quant.qlinear import QuantCtx
from viditq_tpu.samplers import gaussian_diffusion as gd

# model_apply(x, t, y, mask, qctx) -> [B, 2*C, ...]
ModelApply = Callable[..., jnp.ndarray]
# qctx_factory(t_id scalar int32, step_idx scalar int32) -> QuantCtx | None
QctxFactory = Callable[[jnp.ndarray, jnp.ndarray], Optional[QuantCtx]]


def default_qctx_factory(mode: str = "quant",
                         act_slot_map: Optional[np.ndarray] = None
                         ) -> QctxFactory:
    """act_slot_map: [1000] original-timestep -> act table slot (the compact
    replacement for the reference's repeat_interleave expansion,
    quant_model.py:184-197)."""

    def factory(t_id, step_idx):
        slot = (jnp.zeros((), jnp.int32) if act_slot_map is None
                else jnp.asarray(act_slot_map, jnp.int32)[t_id])
        return QuantCtx(t_id=t_id, act_slot=slot, mode=mode)
    return factory


class IDDPM:
    """iddpm/__init__.py:12-132 with jittable loops."""

    def __init__(self, num_sampling_steps: Optional[int] = None,
                 timestep_respacing=None, noise_schedule: str = "linear",
                 diffusion_steps: int = 1000, cfg_scale: float = 4.0,
                 cfg_split: bool = False, in_channels: int = 4):
        self.schedule = gd.make_schedule(
            num_sampling_steps=num_sampling_steps,
            timestep_respacing=timestep_respacing,
            noise_schedule=noise_schedule, diffusion_steps=diffusion_steps)
        self.cfg_scale = cfg_scale
        self.cfg_split = cfg_split
        self.in_channels = in_channels

    def make_cfg_model_fn(self, model_apply: ModelApply, y: jnp.ndarray,
                          mask: Optional[jnp.ndarray],
                          qctx_factory: Optional[QctxFactory] = None
                          ) -> gd.ModelFn:
        """forward_with_cfg (iddpm/__init__.py:135-184), minus the PTQD
        k-division landmine; eps split at in_channels, not 3."""
        s = self.cfg_scale
        c = self.in_channels

        def model_fn(x, t_orig, step_idx):
            B = x.shape[0]
            half = x[: B // 2]
            qctx = (qctx_factory(t_orig[0], step_idx)
                    if qctx_factory is not None else None)
            if self.cfg_split:
                y_cond, y_uncond = jnp.split(y, 2, axis=0)
                out_c = model_apply(half, t_orig[: B // 2], y_cond, mask, qctx)
                out_u = model_apply(half, t_orig[: B // 2], y_uncond, mask,
                                    qctx)
                out = jnp.concatenate([out_c, out_u], axis=0)
            else:
                combined = jnp.concatenate([half, half], axis=0)
                out = model_apply(combined, t_orig, y, mask, qctx)
            eps, rest = out[:, :c], out[:, c:]
            cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
            half_eps = uncond_eps + s * (cond_eps - uncond_eps)
            eps = jnp.concatenate([half_eps, half_eps], axis=0)
            return jnp.concatenate([eps, rest], axis=1)
        return model_fn

    def sample(self, model_apply: ModelApply, z: jnp.ndarray, y: jnp.ndarray,
               mask: Optional[jnp.ndarray] = None,
               sampler_type: str = "ddim",
               rng: Optional[jnp.ndarray] = None,
               qctx_factory: Optional[QctxFactory] = None,
               return_trajectory: bool = False):
        """z: [n, C, ...] (pre-CFG); y: [2n, 1, L, C_cap] = [cond; null];
        mask: [n, L] or [2n, L]. Returns the cond half of the final sample
        (iddpm/__init__.py:126-132), plus {xs, ts} when capturing."""
        z2 = jnp.concatenate([z, z], axis=0)
        model_fn = self.make_cfg_model_fn(model_apply, y, mask, qctx_factory)
        if sampler_type == "ddim":
            out = gd.ddim_sample_loop(
                model_fn, z2, self.schedule, in_channels=self.in_channels,
                capture_trajectory=return_trajectory, rng=rng)
        elif sampler_type == "iddpm":
            assert rng is not None
            out = gd.p_sample_loop(
                model_fn, z2, self.schedule, rng, in_channels=self.in_channels,
                capture_trajectory=return_trajectory)
        else:
            raise NotImplementedError(sampler_type)
        if return_trajectory:
            samples, traj = out
            return jnp.split(samples, 2, axis=0)[0], traj
        return jnp.split(out, 2, axis=0)[0]

    def denoise_range(self, model_apply: ModelApply, x2: jnp.ndarray,
                      y: jnp.ndarray, mask: Optional[jnp.ndarray],
                      step_indices: Sequence[int],
                      qctx_factory: Optional[QctxFactory] = None,
                      rng: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Run a DDIM sub-range on an already CFG-doubled state — the
        building block for timestep-wise mixed precision (each range jits
        with its own static per-layer bit config; reference
        quant_txt2video_mp.py:188-556)."""
        model_fn = self.make_cfg_model_fn(model_apply, y, mask, qctx_factory)
        return gd.ddim_sample_loop(model_fn, x2, self.schedule,
                                   in_channels=self.in_channels,
                                   step_indices=step_indices, rng=rng)

    def act_slot_map(self, calib_steps: Sequence[int] = None) -> np.ndarray:
        """[1000] original-timestep -> nearest calib slot index.

        Replaces `repeat_timestep_wise_quant_params`'s repeat_interleave into
        1000 slots (quant_model.py:184-197) with an index map over the
        compact table. `calib_steps` are the original-scale timesteps whose
        stats were gathered (ascending)."""
        if calib_steps is None:
            calib_steps = list(self.schedule.timestep_map)
        calib_steps = np.asarray(sorted(calib_steps))
        t = np.arange(1000)
        idx = np.abs(t[:, None] - calib_steps[None, :]).argmin(axis=1)
        return idx.astype(np.int32)
