"""Gaussian diffusion math + scan-based DDIM / ancestral sampling loops.

TPU-native counterpart of the reference OpenAI-iddpm stack
(`t2v/opensora/schedulers/iddpm/gaussian_diffusion.py`, `respace.py`): the
timestep-respaced schedule is precomputed into plain numpy arrays, and the
denoise loops are `jax.lax.scan`s — trajectory capture is the scan's
stacked outputs instead of python-side list appends
(gaussian_diffusion.py:639-689), and per-step quantizer state arrives via
index arrays consumed functionally (replacing the reference's mutable
mid-loop `set_quant_state` calls, :691-767).

Landmines intentionally NOT replicated (SURVEY §5): the unconditional PTQD
k-file load (iddpm/__init__.py:168-174) and the `model_out[:, :3]` 3-channel
CFG split on 4-channel latents (:179) — we split at in_channels.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    """OpenAI schedule (gaussian_diffusion.py get_named_beta_schedule)."""
    if name == "linear":
        scale = 1000 / num_steps
        return np.linspace(scale * 1e-4, scale * 2e-2, num_steps,
                           dtype=np.float64)
    if name == "squaredcos_cap_v2":
        def f(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        ts = np.arange(num_steps)
        betas = 1 - f((ts + 1) / num_steps) / f(ts / num_steps)
        return np.minimum(betas, 0.999)
    raise NotImplementedError(name)


def space_timesteps(num_timesteps: int, section_counts) -> list:
    """Evenly respace (reference respace.py space_timesteps)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return list(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} ddim steps")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += stride
        all_steps += taken
        start_idx += size
    return sorted(all_steps)


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Respaced diffusion schedule; all arrays are [n_steps] numpy fp64.

    `timestep_map[i]` is the original-scale timestep (0..999) passed to the
    model at spaced step i (reference respace.py _WrappedModel)."""

    betas: np.ndarray
    timestep_map: np.ndarray

    @property
    def n_steps(self) -> int:
        return len(self.betas)

    def __post_init__(self):
        alphas = 1.0 - self.betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = self.betas * (1.0 - acp_prev) / (1.0 - acp)
        object.__setattr__(self, "alphas_cumprod", acp)
        object.__setattr__(self, "alphas_cumprod_prev", acp_prev)
        object.__setattr__(self, "sqrt_recip_alphas_cumprod",
                           np.sqrt(1.0 / acp))
        object.__setattr__(self, "sqrt_recipm1_alphas_cumprod",
                           np.sqrt(1.0 / acp - 1))
        object.__setattr__(self, "posterior_variance", post_var)
        object.__setattr__(self, "posterior_log_variance_clipped",
                           np.log(np.append(post_var[1], post_var[1:])))
        object.__setattr__(
            self, "posterior_mean_coef1",
            self.betas * np.sqrt(acp_prev) / (1.0 - acp))
        object.__setattr__(
            self, "posterior_mean_coef2",
            (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp))


def make_schedule(num_sampling_steps: Optional[int] = None,
                  timestep_respacing=None,
                  noise_schedule: str = "linear",
                  diffusion_steps: int = 1000) -> Schedule:
    """IDDPM constructor semantics (iddpm/__init__.py:13-49 + respace.py)."""
    base_betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if num_sampling_steps is not None:
        assert timestep_respacing is None
        timestep_respacing = str(num_sampling_steps)
    if not timestep_respacing:
        timestep_respacing = [diffusion_steps]
    use = space_timesteps(diffusion_steps, timestep_respacing)
    base_acp = np.cumprod(1.0 - base_betas)
    last = 1.0
    use_set = set(use)
    new_betas, tmap = [], []
    for i in range(diffusion_steps):
        if i in use_set:
            new_betas.append(1 - base_acp[i] / last)
            last = base_acp[i]
            tmap.append(i)
    return Schedule(betas=np.array(new_betas),
                    timestep_map=np.array(tmap, np.int64))


# model_fn(x, t_orig [B] int32, step_idx scalar int32) -> model output
ModelFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _extract(arr: np.ndarray, i, ndim: int) -> jnp.ndarray:
    """Gather schedule coefficient at (traced) step i, broadcast to ndim."""
    a = jnp.asarray(arr, jnp.float32)
    return a[i].reshape((1,) * ndim)


def _split_eps(model_out: jnp.ndarray, c: int):
    """eps/rest split at the latent channel count (NOT the reference's
    hardcoded 3, iddpm/__init__.py:179)."""
    return model_out[:, :c], model_out[:, c:]


def ddim_sample_loop(model_fn: ModelFn, z: jnp.ndarray, schedule: Schedule,
                     in_channels: int = 4, eta: float = 0.0,
                     capture_trajectory: bool = False,
                     rng: Optional[jnp.ndarray] = None,
                     step_indices: Optional[Sequence[int]] = None):
    """DDIM loop (gaussian_diffusion.py:591-636) as a lax.scan.

    z: [B, C, ...] initial noise (already CFG-doubled by the caller).
    Returns final x, plus (xs, ts) stacked over steps when capturing —
    the reference's calib_data {xs, ts} (:679-689).

    `step_indices` (descending spaced-step ids) runs a sub-range of the
    trajectory — used by timestep-wise mixed precision, where each range is
    a separately-jitted scan with its own static per-layer bit config
    (replaces the reference's mid-loop mutable `load_bitwidth_config`,
    gaussian_diffusion.py:740-767).
    """
    n = schedule.n_steps
    tmap = jnp.asarray(schedule.timestep_map, jnp.int32)
    B = z.shape[0]
    nd = z.ndim

    def step(x, i):
        t_orig = jnp.full((B,), tmap[i], jnp.int32)
        model_out = model_fn(x, t_orig, i)
        eps, _ = _split_eps(model_out, in_channels)
        sr = _extract(schedule.sqrt_recip_alphas_cumprod, i, nd)
        srm1 = _extract(schedule.sqrt_recipm1_alphas_cumprod, i, nd)
        pred_xstart = sr * x - srm1 * eps
        acp = _extract(schedule.alphas_cumprod, i, nd)
        acp_prev = _extract(schedule.alphas_cumprod_prev, i, nd)
        sigma = (eta * jnp.sqrt((1 - acp_prev) / (1 - acp))
                 * jnp.sqrt(1 - acp / acp_prev))
        # re-derive eps from (possibly clipped) xstart — identity w/o clipping
        eps2 = (sr * x - pred_xstart) / srm1
        mean = (jnp.sqrt(acp_prev) * pred_xstart
                + jnp.sqrt(jnp.maximum(1 - acp_prev - sigma ** 2, 0.0)) * eps2)
        if eta > 0:
            assert rng is not None
            noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape,
                                      x.dtype)
            mean = mean + jnp.where(i > 0, 1.0, 0.0) * sigma * noise
        out = (x, t_orig) if capture_trajectory else None
        return mean.astype(x.dtype), out

    steps = (jnp.arange(n - 1, -1, -1) if step_indices is None
             else jnp.asarray(step_indices, jnp.int32))
    x_final, traj = jax.lax.scan(step, z, steps)
    if capture_trajectory:
        return x_final, {"xs": traj[0], "ts": traj[1]}
    return x_final


def p_sample_loop(model_fn: ModelFn, z: jnp.ndarray, schedule: Schedule,
                  rng: jnp.ndarray, in_channels: int = 4,
                  capture_trajectory: bool = False,
                  noise_fn: Optional[Callable] = None):
    """Ancestral sampling with LEARNED_RANGE variance
    (gaussian_diffusion.py p_sample_loop + p_mean_variance).

    noise_fn(x, i) -> noise overrides the Gaussian draw — deterministic
    reproducible sampling, and the hook the oracle-parity tests use to run
    the reference loop and this scan on an identical noise sequence."""
    n = schedule.n_steps
    tmap = jnp.asarray(schedule.timestep_map, jnp.int32)
    B = z.shape[0]
    nd = z.ndim

    def step(x, i):
        t_orig = jnp.full((B,), tmap[i], jnp.int32)
        model_out = model_fn(x, t_orig, i)
        eps, var_raw = _split_eps(model_out, in_channels)
        # LEARNED_RANGE: interpolate log variance between posterior (min) and
        # beta (max)
        min_log = _extract(schedule.posterior_log_variance_clipped, i, nd)
        max_log = jnp.log(_extract(schedule.betas, i, nd))
        frac = (var_raw.astype(jnp.float32) + 1) / 2
        log_var = frac * max_log + (1 - frac) * min_log
        sr = _extract(schedule.sqrt_recip_alphas_cumprod, i, nd)
        srm1 = _extract(schedule.sqrt_recipm1_alphas_cumprod, i, nd)
        pred_xstart = sr * x - srm1 * eps
        mean = (_extract(schedule.posterior_mean_coef1, i, nd) * pred_xstart
                + _extract(schedule.posterior_mean_coef2, i, nd) * x)
        noise = (noise_fn(x, i) if noise_fn is not None
                 else jax.random.normal(jax.random.fold_in(rng, i), x.shape,
                                        jnp.float32))
        nonzero = jnp.where(i > 0, 1.0, 0.0)
        sample = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        out = (x, t_orig) if capture_trajectory else None
        return sample.astype(x.dtype), out

    steps = jnp.arange(n - 1, -1, -1)
    x_final, traj = jax.lax.scan(step, z, steps)
    if capture_trajectory:
        return x_final, {"xs": traj[0], "ts": traj[1]}
    return x_final


def training_losses(model_fn, x_start: jnp.ndarray, t: jnp.ndarray,
                    noise: jnp.ndarray, schedule: Schedule,
                    in_channels: int = 4) -> jnp.ndarray:
    """Simple-MSE diffusion training loss (gaussian_diffusion.py
    training_losses, MSE branch), used by the training step / dryrun.

    t indexes *spaced* steps; model receives original-scale timesteps.
    """
    acp = jnp.asarray(schedule.alphas_cumprod, jnp.float32)[t]
    shape = (-1,) + (1,) * (x_start.ndim - 1)
    x_t = (jnp.sqrt(acp).reshape(shape) * x_start
           + jnp.sqrt(1 - acp).reshape(shape) * noise)
    tmap = jnp.asarray(schedule.timestep_map, jnp.int32)
    model_out = model_fn(x_t, tmap[t])
    eps, _ = _split_eps(model_out, in_channels)
    return jnp.mean((eps - noise) ** 2)
