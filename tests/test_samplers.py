"""Sampler tests: schedule parity, DDIM/p_sample semantics, CFG, DPM-Solver."""

import numpy as np
import jax
import jax.numpy as jnp

from viditq_tpu.samplers import (
    IDDPM, NoiseScheduleVP, dpm_solver_pp_2m, make_schedule, space_timesteps,
    get_named_beta_schedule, ddim_sample_loop, p_sample_loop)


def test_space_timesteps_even():
    steps = space_timesteps(1000, "100")
    assert len(steps) == 100
    assert steps[0] == 0
    assert steps[-1] == 999


def test_spaced_schedule_matches_base_cumprod():
    sched = make_schedule(num_sampling_steps=50)
    base = get_named_beta_schedule("linear", 1000)
    base_acp = np.cumprod(1 - base)
    np.testing.assert_allclose(sched.alphas_cumprod,
                               base_acp[sched.timestep_map], rtol=1e-10)


def test_ddim_zero_eps_telescopes():
    """With eps_hat = 0 the DDIM update telescopes to z / sqrt(acp_T)."""
    sched = make_schedule(num_sampling_steps=10)
    z = jnp.ones((2, 4, 2, 2))

    def model_fn(x, t, i):
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=1)

    out = ddim_sample_loop(model_fn, z, sched, in_channels=4)
    want = 1.0 / np.sqrt(sched.alphas_cumprod[-1])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4)


def test_ddim_perfect_eps_recovers_x0():
    """A model that knows the true x0 makes DDIM exact in one pass."""
    sched = make_schedule(num_sampling_steps=25)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    eps0 = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    acp_T = sched.alphas_cumprod[-1]
    z = np.sqrt(acp_T) * x0 + np.sqrt(1 - acp_T) * eps0

    def model_fn(x, t, i):
        acp = jnp.asarray(sched.alphas_cumprod, jnp.float32)[i]
        eps = (x - jnp.sqrt(acp) * x0) / jnp.sqrt(1 - acp)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)

    out = ddim_sample_loop(model_fn, z.astype(jnp.float32), sched,
                           in_channels=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-2)


def test_ddim_trajectory_capture():
    sched = make_schedule(num_sampling_steps=5)
    z = jnp.ones((2, 4, 2, 2))

    def model_fn(x, t, i):
        return jnp.concatenate([jnp.zeros_like(x)] * 2, axis=1)

    _, traj = ddim_sample_loop(model_fn, z, sched, in_channels=4,
                               capture_trajectory=True)
    assert traj["xs"].shape == (5, 2, 4, 2, 2)
    assert traj["ts"].shape == (5, 2)
    np.testing.assert_array_equal(np.asarray(traj["xs"][0]), np.asarray(z))
    # first model call happens at the last (largest) timestep
    assert int(traj["ts"][0, 0]) == int(sched.timestep_map[-1])
    assert int(traj["ts"][-1, 0]) == int(sched.timestep_map[0])


def test_p_sample_runs_finite():
    sched = make_schedule(num_sampling_steps=5)
    z = jnp.ones((2, 4, 2, 2))

    def model_fn(x, t, i):
        return jnp.concatenate([jnp.zeros_like(x)] * 2, axis=1)

    out = p_sample_loop(model_fn, z, sched, jax.random.PRNGKey(0),
                        in_channels=4)
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_scale_one_equals_cond():
    """cfg_scale=1 -> eps == cond eps; both batch halves get cond update."""
    iddpm = IDDPM(num_sampling_steps=4, cfg_scale=1.0)
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((4, 1, 3, 8)), jnp.float32)

    calls = {}

    def model_apply(x, t, yy, mask, qctx):
        calls["y"] = yy
        # eps depends on y so cond/uncond differ
        bias = jnp.mean(yy, axis=(1, 2, 3)).reshape(-1, 1, 1, 1)
        eps = jnp.broadcast_to(bias, x.shape).astype(x.dtype)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)

    model_fn = iddpm.make_cfg_model_fn(model_apply, y, None)
    x = jnp.asarray(rng.standard_normal((4, 4, 2, 2)), jnp.float32)
    out = model_fn(x, jnp.full((4,), 999, jnp.int32), jnp.asarray(0))
    eps = out[:, :4]
    cond_bias = np.mean(np.asarray(y)[:2], axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(eps[0]).mean(), cond_bias[0],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(eps[:2]), np.asarray(eps[2:]))


def test_cfg_split_matches_joint_for_batch_independent_model():
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.standard_normal((4, 1, 3, 8)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 4, 2, 2)), jnp.float32)

    def model_apply(x, t, yy, mask, qctx):
        bias = jnp.mean(yy, axis=(1, 2, 3)).reshape(-1, 1, 1, 1)
        eps = x * 0.1 + bias
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)

    joint = IDDPM(num_sampling_steps=4, cfg_scale=3.0, cfg_split=False)
    split = IDDPM(num_sampling_steps=4, cfg_scale=3.0, cfg_split=True)
    t = jnp.full((4,), 999, jnp.int32)
    o1 = joint.make_cfg_model_fn(model_apply, y, None)(x, t, jnp.asarray(0))
    o2 = split.make_cfg_model_fn(model_apply, y, None)(x, t, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5)


def test_dpm_solver_exact_for_known_x0():
    ns = NoiseScheduleVP()
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    eps0 = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    t_start, t_end = 1.0, 1e-3
    aT = float(ns.marginal_alpha(jnp.asarray(t_start)))
    sT = float(ns.marginal_std(jnp.asarray(t_start)))
    z = aT * x0 + sT * eps0

    def noise_model_fn(x, t_model, i):
        t_cont = (t_model[0] + 1.0) / 1000.0
        alpha = ns.marginal_alpha(t_cont)
        sigma = ns.marginal_std(t_cont)
        return (x - alpha * x0) / sigma

    out = dpm_solver_pp_2m(noise_model_fn, z, steps=10, t_end=t_end,
                           schedule=ns)
    a0 = float(ns.marginal_alpha(jnp.asarray(t_end)))
    s0 = float(ns.marginal_std(jnp.asarray(t_end)))
    want = a0 * np.asarray(x0) + s0 * np.asarray(eps0)
    np.testing.assert_allclose(np.asarray(out), want, atol=5e-3)


def test_iddpm_act_slot_map():
    iddpm = IDDPM(num_sampling_steps=10)
    m = iddpm.act_slot_map()
    assert m.shape == (1000,)
    assert m.min() == 0 and m.max() == 9
    # slot of a calib timestep maps to itself
    for i, t in enumerate(sorted(iddpm.schedule.timestep_map)):
        assert m[t] == i


def test_lcm_boundary_scalings_match_reference():
    """c_skip/c_out vs the reference formula (lcm_scheduler.py:313-319:
    divide t by 0.1, sigma_data=0.5)."""
    import jax.numpy as jnp
    from viditq_tpu.samplers.extra_solvers import LCMScheduler

    sched = LCMScheduler(num_sampling_steps=4)
    for t in (19.0, 199.0, 399.0, 999.0):
        ts = t / 0.1
        ref_skip = 0.5 ** 2 / (ts ** 2 + 0.5 ** 2)
        ref_out = ts / (ts ** 2 + 0.5 ** 2) ** 0.5
        c_skip, c_out = sched._scalings(jnp.asarray(t, jnp.float32))
        assert abs(float(c_skip) - ref_skip) < 1e-6, (t, float(c_skip), ref_skip)
        assert abs(float(c_out) - ref_out) < 1e-6, (t, float(c_out), ref_out)
