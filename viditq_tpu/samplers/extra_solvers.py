"""Additional t2i samplers: LCM and SA-Solver.

Reference: `t2i/diffusion/lcm_scheduler.py` (459 LoC) and
`t2i/diffusion/{sa_sampler,sa_solver}.py` (1148 LoC). Scan-based rebuilds of
the configurations the t2i scripts expose (`quant_txt2img.py:138-182`):

* LCM — latent consistency sampling: boundary-condition scalings
  c_skip/c_out around an x0 prediction, ancestral re-noising between steps.
* SA-Solver — stochastic-Adams data-prediction solver; with tau=0 this is
  the deterministic multistep collapse (predictor order 2 + trapezoid
  corrector), the setting the reference scripts use by default for
  evaluation-style sampling.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from viditq_tpu.samplers.dpm_solver import NoiseScheduleVP, model_input_timestep
from viditq_tpu.samplers.gaussian_diffusion import get_named_beta_schedule


def get_guidance_scale_embedding(w, embedding_dim: int):
    """Sinusoidal guidance-scale (w) conditioning embedding for
    guidance-distilled consistency models (diffusers
    LCM get_guidance_scale_embedding; see https://arxiv.org/abs/2210.02303
    eq. 17 — w is scaled by 1000 before embedding).

    w: [B] guidance weights. Returns [B, embedding_dim]."""
    w = jnp.asarray(w, jnp.float32) * 1000.0
    half = embedding_dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * (-np.log(10000.0) / (half - 1)))
    emb = w[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class LCMScheduler:
    """Latent-consistency sampling loop.

    boundary conditions (lcm_scheduler.py:313-319,
    get_scalings_for_boundary_condition_discrete — note the reference
    divides by 0.1, i.e. scales t UP by 10x, "almost a delta function at
    t=0"):
      ts = t * 10
      c_skip = s^2 / (ts^2 + s^2),  c_out = ts / sqrt(ts^2 + s^2)
    with sigma_data s = 0.5; denoised = c_out * x0_pred + c_skip * x.

    prediction_type: 'epsilon' | 'sample' | 'v_prediction'
    (lcm_scheduler.step parameterization branch, lcm_scheduler.py:385-396).
    clip_sample / thresholding mirror the reference's x0 post-processing
    (_threshold_sample, lcm_scheduler.py:256-289).

    guidance_embed_dim: when set, sample() computes the sinusoidal
    guidance-scale embedding w_embed = get_guidance_scale_embedding(
    cfg_scale - 1, dim) and passes it to the model as an extra keyword —
    the conditioning input of guidance-distilled LCM backbones.
    """

    sigma_data = 0.5

    def __init__(self, num_sampling_steps: int = 4,
                 lcm_origin_steps: int = 50, diffusion_steps: int = 1000,
                 cfg_scale: float = 4.0, in_channels: int = 4,
                 prediction_type: str = "epsilon",
                 clip_sample: bool = False, thresholding: bool = False,
                 dynamic_thresholding_ratio: float = 0.995,
                 sample_max_value: float = 1.0,
                 guidance_embed_dim: Optional[int] = None):
        assert prediction_type in ("epsilon", "sample", "v_prediction")
        self.steps = num_sampling_steps
        self.cfg_scale = cfg_scale
        self.in_channels = in_channels
        self.prediction_type = prediction_type
        self.clip_sample = clip_sample
        self.thresholding = thresholding
        self.dynamic_thresholding_ratio = dynamic_thresholding_ratio
        self.sample_max_value = sample_max_value
        self.guidance_embed_dim = guidance_embed_dim
        betas = get_named_beta_schedule("linear", diffusion_steps)
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        # LCM timestep schedule (lcm_scheduler.set_timesteps): every k-th of
        # the origin-step grid, descending
        c = diffusion_steps // lcm_origin_steps
        lcm_origin = np.asarray(range(1, lcm_origin_steps + 1)) * c - 1
        skip = max(len(lcm_origin) // num_sampling_steps, 1)
        self.timesteps = lcm_origin[::-skip][:num_sampling_steps]

    def _pred_x0(self, x, out, a):
        """Parameterization branch of step() (lcm_scheduler.py:385-396) plus
        the clip/threshold x0 corrections."""
        if self.prediction_type == "epsilon":
            x0 = (x - jnp.sqrt(1 - a) * out) / jnp.sqrt(a)
        elif self.prediction_type == "sample":
            x0 = out
        else:  # v_prediction
            x0 = jnp.sqrt(a) * x - jnp.sqrt(1 - a) * out
        if self.thresholding:
            p = self.dynamic_thresholding_ratio
            s = jnp.quantile(jnp.abs(x0).reshape(x0.shape[0], -1), p, axis=1)
            s = jnp.clip(s, 1.0, self.sample_max_value).reshape(
                (-1,) + (1,) * (x0.ndim - 1))
            x0 = jnp.clip(x0, -s, s) / s
        elif self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    def _scalings(self, t):
        ts = t * 10.0  # reference t / 0.1 (lcm_scheduler.py:317-318)
        c_skip = self.sigma_data ** 2 / (ts ** 2 + self.sigma_data ** 2)
        c_out = ts / jnp.sqrt(ts ** 2 + self.sigma_data ** 2)
        return c_skip, c_out

    def sample(self, model_apply, z, y, mask=None, rng=None,
               qctx_factory=None, return_trajectory: bool = False):
        """y: [2n, 1, L, C] = [cond; null] (uncond branch unused by default
        LCM but kept for API parity)."""
        acp = jnp.asarray(self.alphas_cumprod, jnp.float32)
        ts = jnp.asarray(self.timesteps, jnp.int32)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        c = self.in_channels
        nd = z.ndim
        y_cond = jnp.split(y, 2, axis=0)[0]

        w_kwargs = {}
        if self.guidance_embed_dim is not None:
            w = jnp.full((z.shape[0],), self.cfg_scale - 1.0, jnp.float32)
            w_kwargs["w_embed"] = get_guidance_scale_embedding(
                w, self.guidance_embed_dim)

        def step(x, i):
            t = ts[i]
            qctx = qctx_factory(t, i) if qctx_factory is not None else None
            tb = jnp.full((x.shape[0],), t, jnp.float32)
            out = model_apply(x, tb, y_cond, mask, qctx, **w_kwargs)
            a = acp[t].reshape((1,) * nd)
            x0 = self._pred_x0(x, out[:, :c], a)
            c_skip, c_out = self._scalings(t.astype(jnp.float32))
            denoised = c_out * x0 + c_skip * x
            # re-noise to the next timestep (ancestral; skipped on the last)
            next_t = jnp.where(i + 1 < self.steps, ts[jnp.minimum(
                i + 1, self.steps - 1)], 0)
            a_next = acp[next_t].reshape((1,) * nd)
            noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape,
                                      x.dtype)
            x_next = jnp.where(
                i + 1 < self.steps,
                jnp.sqrt(a_next) * denoised + jnp.sqrt(1 - a_next) * noise,
                denoised)
            out_t = (x, tb.astype(jnp.int32)) if return_trajectory else None
            return x_next.astype(x.dtype), out_t

        x_final, traj = jax.lax.scan(step, z, jnp.arange(self.steps))
        if return_trajectory:
            return x_final, {"xs": traj[0], "ts": traj[1]}
        return x_final


class EDMSampler:
    """Karras-EDM stochastic Heun sampler (reference t2i/diffusion/
    edm_sample.py, 171 LoC): sigma schedule
    (sigma_max^(1/rho) + i/(N-1) * (sigma_min^(1/rho) - sigma_max^(1/rho)))^rho
    with 2nd-order Heun correction; churn disabled by default (deterministic).

    The model is consumed as a denoiser D(x, sigma) built from the eps
    prediction under the VP-style wrapping the t2i scripts use.
    """

    def __init__(self, num_sampling_steps: int = 18, cfg_scale: float = 4.0,
                 sigma_min: float = 0.002, sigma_max: float = 80.0,
                 rho: float = 7.0, in_channels: int = 4):
        self.steps = num_sampling_steps
        self.cfg_scale = cfg_scale
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max
        self.rho = rho
        self.in_channels = in_channels

    def sigmas(self) -> np.ndarray:
        i = np.arange(self.steps)
        lo, hi, rho = self.sigma_min, self.sigma_max, self.rho
        s = (hi ** (1 / rho)
             + i / max(self.steps - 1, 1) * (lo ** (1 / rho)
                                             - hi ** (1 / rho))) ** rho
        return np.append(s, 0.0)

    def sample(self, denoiser, z, y, mask=None, rng=None,
               qctx_factory=None, return_trajectory: bool = False):
        """denoiser(x, sigma [B], y, mask, qctx) -> denoised x0 estimate.
        z: [B, C, ...] ~ N(0, sigma_max^2). y: [2B,...] = [cond; null]."""
        sig = jnp.asarray(self.sigmas(), jnp.float32)
        B = z.shape[0]
        nd = z.ndim
        s_cfg = self.cfg_scale

        def D(x, sigma, step_idx):
            t_id = jnp.clip((jnp.log(jnp.maximum(sigma, 1e-6)) * 41.0
                             + 500.0).astype(jnp.int32), 0, 999)
            qctx = (qctx_factory(t_id, step_idx)
                    if qctx_factory is not None else None)
            xx = jnp.concatenate([x, x], axis=0)
            ss = jnp.full((2 * B,), sigma, jnp.float32)
            out = denoiser(xx, ss, y, mask, qctx)
            d_c, d_u = jnp.split(out[:, :self.in_channels], 2, axis=0)
            return d_u + s_cfg * (d_c - d_u)

        def step(x, i):
            s0, s1 = sig[i], sig[i + 1]
            denoised = D(x, s0, i)
            d = (x - denoised) / jnp.maximum(s0, 1e-8).reshape((1,) * nd)
            x_euler = x + (s1 - s0).reshape((1,) * nd) * d
            # Heun 2nd-order correction except on the final (sigma=0) step
            denoised2 = D(x_euler, jnp.maximum(s1, self.sigma_min), i)
            d2 = (x_euler - denoised2) / jnp.maximum(s1, 1e-8).reshape(
                (1,) * nd)
            x_heun = x + (s1 - s0).reshape((1,) * nd) * 0.5 * (d + d2)
            x_new = jnp.where(s1 > 0, x_heun, x_euler)
            out = ((x, jnp.full((B,), s0)) if return_trajectory else None)
            return x_new.astype(x.dtype), out

        x_final, traj = jax.lax.scan(step, z, jnp.arange(self.steps))
        if return_trajectory:
            return x_final, {"xs": traj[0], "ts": traj[1]}
        return x_final


class SASolverSampler:
    """SA-Solver scheduler wrapper (reference SASolverSampler,
    t2i/diffusion/sa_sampler.py:10-94): classifier-free guidance over
    [cond; null] embeds, data-prediction SASolver in 'few_steps' mode with
    the reference's default tau schedule tau(t) = eta for t in [0.2, 0.8]
    else 0, eta defaulting to 0 (sa_sampler.py:42,91)."""

    def __init__(self, num_sampling_steps: int = 25, cfg_scale: float = 4.0,
                 in_channels: int = 4, tau=None, eta: float = 0.0,
                 predictor_order: int = 2, corrector_order: int = 2,
                 pc_mode: str = "PEC", mode: str = "few_steps",
                 skip_type: str = "time", skip_order: int = 1,
                 algorithm_type: str = "data_prediction",
                 thresholding: bool = False):
        from viditq_tpu.samplers.sa_solver import SASolver  # noqa: F401
        self.steps = num_sampling_steps
        self.cfg_scale = cfg_scale
        self.in_channels = in_channels
        if tau is None:
            tau = lambda t: eta if 0.2 <= t <= 0.8 else 0.0  # noqa: E731
        self.tau = tau
        self.predictor_order = predictor_order
        self.corrector_order = corrector_order
        self.pc_mode = pc_mode
        self.mode = mode
        self.skip_type = skip_type
        self.skip_order = skip_order
        self.algorithm_type = algorithm_type
        self.thresholding = thresholding
        self.ns = NoiseScheduleVP()

    def sample(self, model_apply, z, y, mask=None, rng=None,
               qctx_factory=None, return_trajectory: bool = False):
        from viditq_tpu.samplers.sa_solver import SASolver
        s = self.cfg_scale
        c = self.in_channels

        def noise_model_fn(x, t_model, step_idx):
            t_id = jnp.clip(t_model[0].astype(jnp.int32), 0, 999)
            qctx = (qctx_factory(t_id, step_idx)
                    if qctx_factory is not None else None)
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.concatenate([t_model, t_model], axis=0)
            out = model_apply(xx, tt, y, mask, qctx)
            out_c, out_u = jnp.split(out, 2, axis=0)
            return out_u[:, :c] + s * (out_c[:, :c] - out_u[:, :c])

        solver = SASolver(
            noise_model_fn, self.ns, algorithm_type=self.algorithm_type,
            correcting_x0_fn=("dynamic_thresholding" if self.thresholding
                              else None))
        return solver.sample(
            z, tau=self.tau, steps=self.steps, skip_type=self.skip_type,
            skip_order=self.skip_order,
            predictor_order=self.predictor_order,
            corrector_order=self.corrector_order, pc_mode=self.pc_mode,
            mode=self.mode, rng=rng,
            capture_trajectory=return_trajectory)
