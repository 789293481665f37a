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


class LCMScheduler:
    """Latent-consistency sampling loop.

    boundary conditions (lcm_scheduler.py:313-319,
    get_scalings_for_boundary_condition_discrete — note the reference
    divides by 0.1, i.e. scales t UP by 10x, "almost a delta function at
    t=0"):
      ts = t * 10
      c_skip = s^2 / (ts^2 + s^2),  c_out = ts / sqrt(ts^2 + s^2)
    with sigma_data s = 0.5; denoised = c_out * x0_pred + c_skip * x.
    """

    sigma_data = 0.5

    def __init__(self, num_sampling_steps: int = 4,
                 lcm_origin_steps: int = 50, diffusion_steps: int = 1000,
                 cfg_scale: float = 4.0, in_channels: int = 4):
        self.steps = num_sampling_steps
        self.cfg_scale = cfg_scale
        self.in_channels = in_channels
        betas = get_named_beta_schedule("linear", diffusion_steps)
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        # LCM timestep schedule (lcm_scheduler.set_timesteps): every k-th of
        # the origin-step grid, descending
        c = diffusion_steps // lcm_origin_steps
        lcm_origin = np.asarray(range(1, lcm_origin_steps + 1)) * c - 1
        skip = max(len(lcm_origin) // num_sampling_steps, 1)
        self.timesteps = lcm_origin[::-skip][:num_sampling_steps]

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

        def step(x, i):
            t = ts[i]
            qctx = qctx_factory(t, i) if qctx_factory is not None else None
            tb = jnp.full((x.shape[0],), t, jnp.float32)
            out = model_apply(x, tb, y_cond, mask, qctx)
            eps = out[:, :c]
            a = acp[t].reshape((1,) * nd)
            x0 = (x - jnp.sqrt(1 - a) * eps) / jnp.sqrt(a)
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
    """SA-Solver (data prediction, predictor order 2 + trapezoid corrector,
    tau=0 deterministic default). CFG layout identical to DPMSolverSampler."""

    def __init__(self, num_sampling_steps: int = 25, cfg_scale: float = 4.0,
                 in_channels: int = 4, tau: float = 0.0):
        self.steps = num_sampling_steps
        self.cfg_scale = cfg_scale
        self.in_channels = in_channels
        self.tau = tau
        self.ns = NoiseScheduleVP()

    def sample(self, model_apply, z, y, mask=None, rng=None,
               qctx_factory=None, return_trajectory: bool = False):
        ns = self.ns
        s = self.cfg_scale
        c = self.in_channels
        nd = z.ndim
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ts = jnp.linspace(1.0, 1.0 / ns.total_N, self.steps + 1,
                          dtype=jnp.float32)
        B = z.shape[0]

        def x0_of(x, t_cont, step_idx):
            t_model = jnp.full((B,), model_input_timestep(t_cont, ns.total_N),
                               jnp.float32)
            t_id = jnp.clip(t_model[0].astype(jnp.int32), 0, 999)
            qctx = (qctx_factory(t_id, step_idx)
                    if qctx_factory is not None else None)
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.concatenate([t_model, t_model], axis=0)
            out = model_apply(xx, tt, y, mask, qctx)
            out_c, out_u = jnp.split(out, 2, axis=0)
            eps = out_u[:, :c] + s * (out_c[:, :c] - out_u[:, :c])
            alpha = ns.marginal_alpha(t_cont).reshape((1,) * nd)
            sigma = ns.marginal_std(t_cont).reshape((1,) * nd)
            return (x - sigma * eps) / alpha

        def transfer(x, t_from, t_to, x0, x0_prev, lam_prev2, order2: bool):
            """x0-form exponential-integrator update t_from -> t_to, with an
            optional 2nd-order (Adams) correction using the previous x0."""
            lam_a = ns.marginal_lambda(t_from)
            lam_b = ns.marginal_lambda(t_to)
            h = lam_b - lam_a
            sig_a = ns.marginal_std(t_from)
            sig_b = ns.marginal_std(t_to)
            alp_b = ns.marginal_alpha(t_to)
            d = jnp.zeros_like(x0)
            if order2:
                h_prev = lam_a - lam_prev2
                r = h_prev / jnp.maximum(h, 1e-12)
                d = (x0 - x0_prev) / (2.0 * jnp.maximum(r, 1e-12))
            x_new = (sig_b / sig_a).reshape((1,) * nd) * x \
                - (alp_b * jnp.expm1(-h)).reshape((1,) * nd) * (x0 + d)
            if self.tau > 0:
                # stochastic variant: inject scaled noise (SA-Solver SDE tau)
                g = jnp.sqrt(jnp.maximum(sig_b ** 2 *
                                         (1 - jnp.exp(-2 * h * self.tau ** 2)),
                                         0.0))
                x_new = x_new + g * jax.random.normal(
                    jax.random.fold_in(rng, int(0)), x.shape, x.dtype)
            return x_new

        # first step: order 1 predictor
        x = z
        x0_prev = x0_of(x, ts[0], jnp.asarray(0, jnp.int32))
        lam0 = ns.marginal_lambda(ts[0])
        x = transfer(x, ts[0], ts[1], x0_prev, x0_prev, lam0, order2=False)
        traj0 = (z, jnp.full((B,), model_input_timestep(ts[0], ns.total_N)))

        def step(carry, i):
            x, x0_prev, lam_prev = carry
            t_prev, t_cur = ts[i], ts[i + 1]
            # predictor (order 2, Adams-Bashforth flavor)
            x0_cur = x0_of(x, t_prev, i)
            x_pred = transfer(x, t_prev, t_cur, x0_cur, x0_prev, lam_prev,
                              order2=True)
            # corrector (trapezoid, Adams-Moulton flavor): re-evaluate at the
            # new point and average data predictions
            x0_new = x0_of(x_pred, t_cur, i)
            x0_corr = 0.5 * (x0_cur + x0_new)
            x_corr = transfer(x, t_prev, t_cur, x0_corr, x0_prev, lam_prev,
                              order2=False)
            out = ((x, jnp.full((B,), model_input_timestep(t_prev,
                                                           ns.total_N)))
                   if return_trajectory else None)
            return (x_corr.astype(x.dtype), x0_cur,
                    ns.marginal_lambda(t_prev)), out

        init = (x.astype(z.dtype), x0_prev, lam0)
        (x_final, _, _), traj = jax.lax.scan(step, init,
                                             jnp.arange(1, self.steps))
        if return_trajectory:
            xs = jnp.concatenate([traj0[0][None], traj[0]], axis=0)
            tss = jnp.concatenate([traj0[1][None], traj[1]], axis=0)
            return x_final, {"xs": xs, "ts": tss}
        return x_final
