"""LCM + SA-Solver tests."""

import numpy as np
import jax
import jax.numpy as jnp

from viditq_tpu.samplers import LCMScheduler, SASolverSampler, NoiseScheduleVP


def perfect_model(x0):
    """model_apply that knows the true x0 under the discrete VP schedule."""
    ns = NoiseScheduleVP()
    acp = jnp.asarray(np.cumprod(1 - np.asarray(
        __import__("viditq_tpu.samplers.gaussian_diffusion",
                   fromlist=["get_named_beta_schedule"])
        .get_named_beta_schedule("linear", 1000))), jnp.float32)

    def model_apply(x, t, y, mask, qctx):
        t_cont = (t[0] + 1.0) / 1000.0
        alpha = ns.marginal_alpha(t_cont)
        sigma = ns.marginal_std(t_cont)
        eps = (x - alpha * x0) / sigma
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)
    return model_apply


def test_sa_solver_recovers_known_x0():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    eps0 = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    ns = NoiseScheduleVP()
    aT = float(ns.marginal_alpha(jnp.asarray(1.0)))
    sT = float(ns.marginal_std(jnp.asarray(1.0)))
    z = aT * x0 + sT * eps0
    sampler = SASolverSampler(num_sampling_steps=8, cfg_scale=1.0)
    y = jnp.zeros((2, 1, 4, 8))
    out = sampler.sample(perfect_model(x0), z, y)
    t_end = 1.0 / ns.total_N
    a0 = float(ns.marginal_alpha(jnp.asarray(t_end)))
    s0 = float(ns.marginal_std(jnp.asarray(t_end)))
    want = a0 * np.asarray(x0) + s0 * np.asarray(eps0)
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-2)


def test_sa_solver_trajectory_capture():
    z = jnp.ones((1, 4, 4, 4))
    y = jnp.zeros((2, 1, 4, 8))

    def model_apply(x, t, yy, mm, qctx):
        return jnp.concatenate([jnp.zeros_like(x)] * 2, axis=1)

    sampler = SASolverSampler(num_sampling_steps=5)
    out, traj = sampler.sample(model_apply, z, y, return_trajectory=True)
    assert traj["xs"].shape == (5, 1, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_lcm_runs_and_timestep_schedule():
    sched = LCMScheduler(num_sampling_steps=4, lcm_origin_steps=50)
    assert len(sched.timesteps) == 4
    assert sched.timesteps[0] > sched.timesteps[-1]
    z = jnp.ones((1, 4, 4, 4))
    y = jnp.zeros((2, 1, 4, 8))

    def model_apply(x, t, yy, mm, qctx):
        return jnp.concatenate([x * 0.1, jnp.zeros_like(x)], axis=1)

    out = sched.sample(model_apply, z, y, rng=jax.random.PRNGKey(0))
    assert out.shape == z.shape
    assert np.isfinite(np.asarray(out)).all()


def test_edm_recovers_constant_denoiser():
    """With a denoiser that always returns x0, Heun-EDM converges to x0."""
    from viditq_tpu.samplers import EDMSampler
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    sampler = EDMSampler(num_sampling_steps=10, cfg_scale=1.0)
    z = x0 + sampler.sigma_max * jnp.asarray(
        rng.standard_normal((1, 4, 4, 4)), jnp.float32)

    def denoiser(x, sigma, y, mask, qctx):
        d = jnp.broadcast_to(x0, x.shape)
        return jnp.concatenate([d, jnp.zeros_like(d)], axis=1)

    y = jnp.zeros((2, 1, 4, 8))
    out = sampler.sample(denoiser, z, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)
    sig = sampler.sigmas()
    assert sig[0] == sampler.sigma_max and sig[-1] == 0.0


def test_lcm_prediction_types_and_clip():
    """'sample' and 'v_prediction' parameterizations + clip_sample
    (reference lcm_scheduler.step branch, lcm_scheduler.py:385-396)."""
    z = jnp.ones((1, 4, 4, 4))
    y = jnp.zeros((2, 1, 4, 8))

    def model_apply(x, t, yy, mm, qctx):
        return jnp.concatenate([x * 0.1, jnp.zeros_like(x)], axis=1)

    for pt in ("sample", "v_prediction"):
        sched = LCMScheduler(num_sampling_steps=4, prediction_type=pt,
                             clip_sample=True)
        out = sched.sample(model_apply, z, y, rng=jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(out)).all()
    # thresholding path
    sched = LCMScheduler(num_sampling_steps=2, thresholding=True)
    out = sched.sample(model_apply, z, y, rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


def test_lcm_guidance_scale_embedding():
    """w-embedding matches the sinusoidal formula (diffusers LCM
    get_guidance_scale_embedding: w*1000, half sin / half cos)."""
    from viditq_tpu.samplers.extra_solvers import get_guidance_scale_embedding

    emb = np.asarray(get_guidance_scale_embedding(jnp.asarray([3.0]), 8))
    w = 3.0 * 1000.0
    freqs = np.exp(np.arange(4) * (-np.log(10000.0) / 3))
    want = np.concatenate([np.sin(w * freqs), np.cos(w * freqs)])
    np.testing.assert_allclose(emb[0], want, rtol=1e-5)
    # odd dim pads
    assert np.asarray(get_guidance_scale_embedding(jnp.asarray([1.0]), 7)
                      ).shape == (1, 7)
    # the scheduler passes it through to the model
    seen = {}

    def model_apply(x, t, yy, mm, qctx, w_embed=None):
        seen["w"] = w_embed
        return jnp.concatenate([x * 0.1, jnp.zeros_like(x)], axis=1)

    sched = LCMScheduler(num_sampling_steps=2, cfg_scale=4.5,
                         guidance_embed_dim=16)
    z = jnp.ones((2, 4, 4, 4))
    y = jnp.zeros((4, 1, 4, 8))
    sched.sample(model_apply, z, y, rng=jax.random.PRNGKey(0))
    assert seen["w"].shape == (2, 16)
    want0 = np.asarray(get_guidance_scale_embedding(
        jnp.asarray([3.5, 3.5]), 16))
    np.testing.assert_allclose(np.asarray(seen["w"]), want0, rtol=1e-5)
