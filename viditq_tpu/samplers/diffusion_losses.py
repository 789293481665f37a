"""Likelihood terms and loss-aware timestep samplers for diffusion training.

Reference: `t2v/opensora/schedulers/iddpm/diffusion_utils.py` (normal_kl,
discretized/continuous Gaussian log-likelihood) and `timestep_sampler.py`
(UniformSampler / LossSecondMomentResampler), plus the vb branch of
`gaussian_diffusion.py training_losses` (loss types MSE / RESCALED_MSE /
KL / RESCALED_KL with LEARNED_RANGE variance).

TPU-first redesign of the samplers: the reference keeps numpy ring-buffer
state mutated host-side and all-gathers losses over ranks
(timestep_sampler.py:79-121); here the sampler state is an explicit pytree
updated by pure jittable functions — under pjit the loss/timestep arrays
are already global, so the distributed all_gather disappears into GSPMD.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from viditq_tpu.samplers.gaussian_diffusion import Schedule, _split_eps


# ---------------------------------------------------------------------------
# likelihoods (diffusion_utils.py:18-87)
# ---------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two gaussians, broadcasting (diffusion_utils.py:18-35)."""
    logvar1 = jnp.asarray(logvar1, jnp.float32)
    logvar2 = jnp.asarray(logvar2, jnp.float32)
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    """diffusion_utils.py:38-43."""
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi)
                                 * (x + 0.044715 * x ** 3)))


def continuous_gaussian_log_likelihood(x, *, means, log_scales):
    """log N(x; means, exp(log_scales)^2) (diffusion_utils.py:46-58)."""
    z = (x - means) * jnp.exp(-log_scales)
    return -0.5 * (z ** 2 + np.log(2 * np.pi))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretized to uint8 bins scaled to
    [-1, 1] (diffusion_utils.py:61-87)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255))
    cdf_min = approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255))
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    log_delta = jnp.log(jnp.clip(cdf_plus - cdf_min, 1e-12))
    return jnp.where(x < -0.999, log_cdf_plus,
                     jnp.where(x > 0.999, log_one_minus, log_delta))


# ---------------------------------------------------------------------------
# variational-bound terms (gaussian_diffusion.py q_posterior / p_mean_variance
# / _vb_terms_bpd, LEARNED_RANGE variance)
# ---------------------------------------------------------------------------

def _bcast(arr, t, ndim):
    return jnp.asarray(arr, jnp.float32)[t].reshape((-1,) + (1,) * (ndim - 1))


def q_posterior_mean_logvar(schedule: Schedule, x_start, x_t, t):
    mean = (_bcast(schedule.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _bcast(schedule.posterior_mean_coef2, t, x_t.ndim) * x_t)
    logvar = _bcast(schedule.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, logvar


def p_mean_logvar_learned_range(schedule: Schedule, eps, var_raw, x_t, t,
                                clip_denoised: bool = False):
    """Model p(x_{t-1}|x_t) mean/logvar under eps-prediction with
    LEARNED_RANGE variance (gaussian_diffusion.py p_mean_variance)."""
    nd = x_t.ndim
    min_log = _bcast(schedule.posterior_log_variance_clipped, t, nd)
    max_log = _bcast(np.log(schedule.betas), t, nd)
    frac = (var_raw.astype(jnp.float32) + 1.0) / 2.0
    model_logvar = frac * max_log + (1 - frac) * min_log
    x0 = (_bcast(schedule.sqrt_recip_alphas_cumprod, t, nd) * x_t
          - _bcast(schedule.sqrt_recipm1_alphas_cumprod, t, nd) * eps)
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
    mean, _ = q_posterior_mean_logvar(schedule, x0, x_t, t)
    return mean, model_logvar


def vb_terms(schedule: Schedule, model_out, x_start, x_t, t,
             in_channels: int = 4, stop_mean_grad: bool = True):
    """Per-sample variational-bound term in bits (the reference
    _vb_terms_bpd with frozen mean — training_losses detaches the mean so
    the vb term only trains the variance head)."""
    eps, var_raw = _split_eps(model_out, in_channels)
    if var_raw.shape[1] == 0:
        raise ValueError("vb term needs a learned-variance model output "
                         "(2*in_channels output channels)")
    if stop_mean_grad:
        eps = jax.lax.stop_gradient(eps)
    true_mean, true_logvar = q_posterior_mean_logvar(schedule, x_start,
                                                     x_t, t)
    mean, logvar = p_mean_logvar_learned_range(schedule, eps, var_raw,
                                               x_t, t)
    kl = normal_kl(true_mean, true_logvar, mean, logvar)
    kl = jnp.mean(kl.reshape(kl.shape[0], -1), axis=-1) / np.log(2.0)
    nll = -discretized_gaussian_log_likelihood(
        x_start, means=mean, log_scales=0.5 * logvar)
    nll = jnp.mean(nll.reshape(nll.shape[0], -1), axis=-1) / np.log(2.0)
    return jnp.where(t == 0, nll, kl)


def training_losses_full(model_fn, x_start, t, noise, schedule: Schedule,
                         loss_type: str = "mse", in_channels: int = 4):
    """Per-sample training losses (reference training_losses, all four loss
    types). Returns {'loss': [B], 'mse': [B], 'vb': [B]}.

    t indexes spaced steps; the model receives original-scale timesteps.
    """
    assert loss_type in ("mse", "rescaled_mse", "kl", "rescaled_kl")
    nd = x_start.ndim
    acp = jnp.asarray(schedule.alphas_cumprod, jnp.float32)[t]
    shape = (-1,) + (1,) * (nd - 1)
    x_t = (jnp.sqrt(acp).reshape(shape) * x_start
           + jnp.sqrt(1 - acp).reshape(shape) * noise)
    tmap = jnp.asarray(schedule.timestep_map, jnp.int32)
    model_out = model_fn(x_t, tmap[t])
    eps, var_raw = _split_eps(model_out, in_channels)
    # _split_eps returns a 0-channel slice (not None) for models that
    # predict eps only (pred_sigma=False): vb terms need a learned
    # variance, so gate on the channel count
    has_var = var_raw.shape[1] > 0
    zeros = jnp.zeros((x_start.shape[0],), jnp.float32)

    if loss_type in ("kl", "rescaled_kl"):
        if not has_var:
            raise ValueError(
                "kl/rescaled_kl losses need a learned-variance model "
                "(model output channels == 2*in_channels); this model "
                "predicts eps only")
        vb = vb_terms(schedule, model_out, x_start, x_t, t, in_channels,
                      stop_mean_grad=False)
        if loss_type == "rescaled_kl":
            vb = vb * schedule.n_steps
        return {"loss": vb, "mse": zeros, "vb": vb}

    mse = jnp.mean(((eps - noise) ** 2).reshape(x_start.shape[0], -1),
                   axis=-1)
    vb = zeros
    if has_var:
        vb = vb_terms(schedule, model_out, x_start, x_t, t, in_channels)
        if loss_type == "rescaled_mse":
            # keep the vb term's relative weight when the MSE is rescaled
            # (gaussian_diffusion.py: vb * num_timesteps / 1000)
            vb = vb * schedule.n_steps / 1000.0
    loss = mse + vb
    return {"loss": loss, "mse": mse, "vb": vb}


# ---------------------------------------------------------------------------
# timestep samplers (timestep_sampler.py)
# ---------------------------------------------------------------------------

class UniformSampler:
    """timestep_sampler.py:69-76."""

    def __init__(self, n_steps: int):
        self.n_steps = n_steps

    def sample(self, rng, batch_size: int):
        t = jax.random.randint(rng, (batch_size,), 0, self.n_steps)
        return t, jnp.ones((batch_size,), jnp.float32)


@flax.struct.dataclass
class LossSamplerState:
    """Functional ring-buffer state of LossSecondMomentResampler
    (timestep_sampler.py:122-151)."""

    history: jnp.ndarray   # [T, H] per-timestep loss history
    counts: jnp.ndarray    # [T] int32 fill counts


@dataclasses.dataclass(frozen=True)
class LossSecondMomentResampler:
    """Importance-samples timesteps by the second moment of recent losses;
    unbiased via 1/(T p) weights. State is an explicit pytree — updates and
    sampling are pure and jittable (vs the reference's host-side numpy +
    dist.all_gather, timestep_sampler.py:79-151)."""

    n_steps: int
    history_per_term: int = 10
    uniform_prob: float = 0.001

    def init(self) -> LossSamplerState:
        return LossSamplerState(
            history=jnp.zeros((self.n_steps, self.history_per_term),
                              jnp.float32),
            counts=jnp.zeros((self.n_steps,), jnp.int32))

    def weights(self, state: LossSamplerState) -> jnp.ndarray:
        warmed = jnp.all(state.counts == self.history_per_term)
        w = jnp.sqrt(jnp.mean(state.history ** 2, axis=-1))
        w = w / jnp.maximum(jnp.sum(w), 1e-12)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.n_steps
        return jnp.where(warmed, w, jnp.ones((self.n_steps,)) / self.n_steps)

    def sample(self, state: LossSamplerState, rng, batch_size: int):
        """-> (t [B], weights [B]) (timestep_sampler.py:51-67)."""
        p = self.weights(state)
        p = p / jnp.sum(p)
        t = jax.random.choice(rng, self.n_steps, (batch_size,), p=p)
        w = 1.0 / (self.n_steps * p[t])
        return t, w

    def update(self, state: LossSamplerState, ts, losses
               ) -> LossSamplerState:
        """Push each (t, loss) into t's ring buffer
        (timestep_sampler.py:139-148: shift-left when full, else append).
        Sequential over the batch to keep the reference's exact semantics
        when a batch repeats a timestep."""

        def push(state, tl):
            t, loss = tl
            hist_t = state.history[t]
            cnt = state.counts[t]
            full = cnt >= self.history_per_term
            shifted = jnp.concatenate([hist_t[1:],
                                       jnp.asarray([loss], jnp.float32)])
            appended = hist_t.at[jnp.minimum(
                cnt, self.history_per_term - 1)].set(loss)
            new_hist = jnp.where(full, shifted, appended)
            new_cnt = jnp.where(full, cnt, cnt + 1)
            return LossSamplerState(
                history=state.history.at[t].set(new_hist),
                counts=state.counts.at[t].set(new_cnt)), None

        state, _ = jax.lax.scan(
            push, state, (jnp.asarray(ts, jnp.int32),
                          jnp.asarray(losses, jnp.float32)))
        return state


def create_named_schedule_sampler(name: str, n_steps: int):
    """timestep_sampler.py:20-31."""
    if name == "uniform":
        return UniformSampler(n_steps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(n_steps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
