"""DPM-Solver++ (2M multistep) for discrete-noise-schedule models.

TPU-native counterpart of the reference's vendored DPM-Solver
(`t2v/opensora/schedulers/dpms/dpm_solver.py`, `t2i/diffusion/
dpm_solver_alpha.py` — the t2i default sampler at 20 steps). Only the
configuration the reference flows actually use is implemented:
NoiseScheduleVP('discrete'), data-prediction (dpmsolver++), multistep
order 2, time_uniform skip — as a `lax.scan` with trajectory capture.

The CFG wrapper mirrors `model_wrapper(..., guidance_type='classifier-free')`:
a single batched forward over [cond; uncond] with eps mixed before the
solver update, and `forward_with_dpmsolver` semantics (the model's variance
channels are dropped: dpms/__init__.py:44-50 chunks the output in half).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from viditq_tpu.samplers.gaussian_diffusion import get_named_beta_schedule


class NoiseScheduleVP:
    """Discrete VP schedule: interpolated log_alpha over t in (0, 1]."""

    def __init__(self, betas: Optional[np.ndarray] = None,
                 diffusion_steps: int = 1000):
        if betas is None:
            betas = get_named_beta_schedule("linear", diffusion_steps)
        log_alphas = 0.5 * np.log(1 - betas).cumsum()
        self.total_N = len(betas)
        self.T = 1.0
        self.t_array = ((np.arange(self.total_N) + 1.0) / self.total_N)
        self.log_alpha_array = log_alphas

    def marginal_log_mean_coeff(self, t):
        return jnp.interp(t, jnp.asarray(self.t_array, jnp.float32),
                          jnp.asarray(self.log_alpha_array, jnp.float32))

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_alpha = self.marginal_log_mean_coeff(t)
        return log_alpha - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_alpha))


def model_input_timestep(t_cont, total_n: int = 1000):
    """Continuous t in (0,1] -> discrete model timestep (dpm_solver.py
    model_wrapper: (t - 1/N) * N)."""
    return (t_cont - 1.0 / total_n) * total_n


def dpm_solver_pp_2m(noise_model_fn: Callable, z: jnp.ndarray,
                     steps: int = 20, t_start: float = 1.0,
                     t_end: Optional[float] = None,
                     schedule: Optional[NoiseScheduleVP] = None,
                     capture_trajectory: bool = False):
    """Multistep DPM-Solver++ order 2 with time_uniform spacing.

    noise_model_fn(x, t_model [B] float32, step_idx) -> eps prediction
    (same shape as x). Returns final x (plus {xs, ts} when capturing).
    """
    ns = schedule or NoiseScheduleVP()
    t_end = t_end if t_end is not None else 1.0 / ns.total_N
    ts = jnp.linspace(t_start, t_end, steps + 1, dtype=jnp.float32)
    B = z.shape[0]
    nd = z.ndim

    def x0_pred(x, t_cont, step_idx):
        t_model = jnp.full((B,), model_input_timestep(t_cont, ns.total_N),
                           jnp.float32)
        eps = noise_model_fn(x, t_model, step_idx)
        alpha = ns.marginal_alpha(t_cont).reshape((1,) * nd)
        sigma = ns.marginal_std(t_cont).reshape((1,) * nd)
        return (x - sigma * eps) / alpha

    # first step: DPM-Solver++ 1 (equivalent to DDIM in x0 form)
    x = z
    x0_prev = x0_pred(x, ts[0], jnp.asarray(0, jnp.int32))
    lam_prev = ns.marginal_lambda(ts[0])
    sigma0, sigma1 = ns.marginal_std(ts[0]), ns.marginal_std(ts[1])
    lam1 = ns.marginal_lambda(ts[1])
    alpha1 = ns.marginal_alpha(ts[1])
    h = lam1 - lam_prev
    x = (sigma1 / sigma0).reshape((1,) * nd) * x \
        - (alpha1 * jnp.expm1(-h)).reshape((1,) * nd) * x0_prev
    traj0 = (z, jnp.full((B,), model_input_timestep(ts[0], ns.total_N)))

    def step(carry, i):
        x, x0_prev, lam_prev2 = carry
        t_prev, t_cur = ts[i], ts[i + 1]
        x0_cur = x0_pred(x, t_prev, i)
        lam_prev = ns.marginal_lambda(t_prev)
        lam_cur = ns.marginal_lambda(t_cur)
        h = lam_cur - lam_prev
        h_prev = lam_prev - lam_prev2
        r = h_prev / h
        # 2M update (dpm_solver.py multistep_dpm_solver_second_update,
        # dpmsolver++ branch)
        d = (1.0 / (2.0 * r)) * (x0_cur - x0_prev)
        sigma_cur = ns.marginal_std(t_cur)
        sigma_prev = ns.marginal_std(t_prev)
        alpha_cur = ns.marginal_alpha(t_cur)
        x_new = (sigma_cur / sigma_prev).reshape((1,) * nd) * x \
            - (alpha_cur * jnp.expm1(-h)).reshape((1,) * nd) * (x0_cur + d)
        out = ((x, jnp.full((B,), model_input_timestep(t_prev, ns.total_N)))
               if capture_trajectory else None)
        return (x_new.astype(x.dtype), x0_cur, lam_prev), out

    init = (x.astype(z.dtype), x0_prev, lam_prev)
    (x_final, _, _), traj = jax.lax.scan(step, init,
                                         jnp.arange(1, steps))
    if capture_trajectory:
        xs = jnp.concatenate([traj0[0][None], traj[0]], axis=0)
        tss = jnp.concatenate([traj0[1][None], traj[1]], axis=0)
        return x_final, {"xs": xs, "ts": tss}
    return x_final


class DPMSolverSampler:
    """Scheduler-registry wrapper (reference DMP_SOLVER,
    dpms/__init__.py:11-50): CFG over [cond; null] text embeds, variance
    channels chunked off before solving."""

    def __init__(self, num_sampling_steps: int = 20, cfg_scale: float = 4.0,
                 in_channels: int = 4, cfg_split: bool = False):
        self.steps = num_sampling_steps
        self.cfg_scale = cfg_scale
        self.in_channels = in_channels
        self.cfg_split = cfg_split
        self.ns = NoiseScheduleVP()

    def sample(self, model_apply, z, y, mask=None, rng=None,
               qctx_factory=None, return_trajectory: bool = False):
        """z: [n, C, ...]; y: [2n, 1, L, C_cap] = [cond; null]."""
        c = self.in_channels
        s = self.cfg_scale

        def noise_model_fn(x, t_model, step_idx):
            # x batch is n (no doubling needed for dpmsolver++ cfg wrapper)
            t_id = jnp.clip(t_model[0].astype(jnp.int32), 0, 999)
            qctx = (qctx_factory(t_id, step_idx)
                    if qctx_factory is not None else None)
            if self.cfg_split:
                y_cond, y_null = jnp.split(y, 2, axis=0)
                out_c = model_apply(x, t_model, y_cond, mask, qctx)
                out_u = model_apply(x, t_model, y_null, mask, qctx)
            else:
                xx = jnp.concatenate([x, x], axis=0)
                tt = jnp.concatenate([t_model, t_model], axis=0)
                out = model_apply(xx, tt, y, mask, qctx)
                out_c, out_u = jnp.split(out, 2, axis=0)
            eps_c, eps_u = out_c[:, :c], out_u[:, :c]
            return eps_u + s * (eps_c - eps_u)

        return dpm_solver_pp_2m(noise_model_fn, z, steps=self.steps,
                                schedule=self.ns,
                                capture_trajectory=return_trajectory)
