"""IDDPM ddim / p_sample loop oracle parity vs the reference
SpacedDiffusion (round-2 VERDICT missing #3 / next #4).

The reference loops (`t2v/opensora/schedulers/iddpm/gaussian_diffusion.py:
591-767` + `respace.py`) are driven directly with a deterministic pseudo-
model implemented identically in torch and jnp; our scan-based loops
(`viditq_tpu/samplers/gaussian_diffusion.py`) must reproduce the final
sample and — for ddim — the trajectory-capture contents. Covers:

* ddim at two step counts, including a multi-section respaced schedule
  and a "ddimN" stride schedule (respace.py space_timesteps semantics)
* p_sample with LEARNED_RANGE variance on an identical injected noise
  sequence (noise_fn hook)
* trajectory capture xs/ts content parity (the reference prepends each
  step so its arrays are ascending-t; our scan stacks execution order —
  compare against the flip)

clip_denoised=False everywhere — the workload's own setting
(iddpm/__init__.py:107,118).
"""

import functools
import os

import numpy as np
import pytest

pytestmark = [pytest.mark.heavy, pytest.mark.skipif(
    not os.path.exists("/root/reference/t2v"), reason="reference not mounted")]

SHAPE = (2, 4, 2, 4, 4)  # [B, C, T, H, W]
C = 4


def _torch_model(qnn, x, t, y=None, mask=None, capture=False):
    import torch
    tt = (t.float() / 1000.0).reshape(-1, 1, 1, 1, 1)
    eps = 0.6 * x * torch.cos(3.1 * tt) + 0.2 * torch.sin(2.7 * x) - 0.1 * tt
    var = 0.5 * torch.tanh(x) + 0.2 * torch.cos(tt) - 0.1
    out = torch.cat([eps, var], dim=1)
    if capture:
        # forward_with_cfg return_trajectory=True returns (out, raw_out)
        # (iddpm/__init__.py:182-184) -> p_mean_variance 'extra' ->
        # ddim_sample 'model_output' (gaussian_diffusion.py:552,634)
        return out, out
    return out


def _jnp_model(x, t_orig, step_idx):
    import jax.numpy as jnp
    tt = (t_orig.astype(jnp.float32) / 1000.0).reshape(-1, 1, 1, 1, 1)
    eps = 0.6 * x * jnp.cos(3.1 * tt) + 0.2 * jnp.sin(2.7 * x) - 0.1 * tt
    var = 0.5 * jnp.tanh(x) + 0.2 * jnp.cos(tt) - 0.1
    return jnp.concatenate([eps, var], axis=1)


def _ref_diffusion(**kw):
    from ref_models import load_iddpm_module
    return load_iddpm_module().IDDPM(**kw)


def _pseudo_model(capture=False):
    """partial so the reference progressive loop's `model.args[0]` probe
    (gaussian_diffusion.py:691) finds an object without quant attrs."""
    return functools.partial(_torch_model, object(), capture=capture)


@pytest.mark.parametrize("respacing", [
    dict(num_sampling_steps=20),
    dict(timestep_respacing="10,5"),
    dict(timestep_respacing="ddim25"),
])
def test_ddim_loop_parity(respacing):
    import torch
    import jax.numpy as jnp

    from viditq_tpu.samplers.gaussian_diffusion import (ddim_sample_loop,
                                                        make_schedule)

    ref = _ref_diffusion(**respacing)
    rng = np.random.default_rng(0)
    z = rng.standard_normal(SHAPE).astype(np.float32)

    with torch.no_grad():
        want = ref.ddim_sample_loop(
            _pseudo_model(), SHAPE, torch.tensor(z), clip_denoised=False,
            model_kwargs={}, device="cpu").numpy()

    sched = make_schedule(**respacing)
    np.testing.assert_array_equal(
        sched.timestep_map, np.asarray(ref.timestep_map))
    got = np.asarray(ddim_sample_loop(_jnp_model, jnp.asarray(z), sched,
                                      in_channels=C))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-4, rel


def test_ddim_trajectory_capture_parity():
    import torch
    import jax.numpy as jnp

    from viditq_tpu.samplers.gaussian_diffusion import (ddim_sample_loop,
                                                        make_schedule)

    ref = _ref_diffusion(num_sampling_steps=10)
    rng = np.random.default_rng(1)
    z = rng.standard_normal(SHAPE).astype(np.float32)
    y = torch.tensor(rng.standard_normal((2, 1, 8, 16)).astype(np.float32))
    mask = torch.ones(2, 8)

    with torch.no_grad():
        final, data, out_data = ref.ddim_sample_loop(
            _pseudo_model(capture=True), SHAPE, torch.tensor(z),
            clip_denoised=False,
            model_kwargs={"y": y, "mask": mask}, device="cpu",
            return_trajectory=True)

    sched = make_schedule(num_sampling_steps=10)
    got_final, traj = ddim_sample_loop(_jnp_model, jnp.asarray(z), sched,
                                       in_channels=C,
                                       capture_trajectory=True)
    # reference prepends each step (ascending t); our scan stacks in
    # execution order (descending t) -> flip
    xs = np.asarray(traj["xs"])[::-1]
    ts = np.asarray(traj["ts"])[::-1]
    assert xs.shape == tuple(data["xs"].shape), (xs.shape, data["xs"].shape)
    np.testing.assert_array_equal(ts, data["ts"].numpy())
    rel = (np.linalg.norm(xs - data["xs"].numpy())
           / np.linalg.norm(data["xs"].numpy()))
    assert rel < 1e-4, rel
    relf = (np.linalg.norm(np.asarray(got_final) - final.numpy())
            / np.linalg.norm(final.numpy()))
    assert relf < 1e-4, relf
    # the reference also returns per-step raw model outputs (out_data)
    assert len(out_data) == 10


@pytest.mark.parametrize("n_steps", [10, 25])
def test_p_sample_loop_parity(n_steps):
    """Ancestral loop with LEARNED_RANGE variance. The reference draws
    torch.randn inside p_sample — patch it with a deterministic map of x
    and inject the identical sequence through our noise_fn hook."""
    import torch
    import jax.numpy as jnp

    from viditq_tpu.samplers.gaussian_diffusion import (make_schedule,
                                                        p_sample_loop)

    ref = _ref_diffusion(num_sampling_steps=n_steps)
    rng = np.random.default_rng(2)
    z = rng.standard_normal(SHAPE).astype(np.float32)

    # derivative of the injected noise map must stay < 1 or fp32 rounding
    # differences amplify chaotically across steps (sin(7.3x) hit 1.5e-3
    # by 25 steps); sin(0.5x) is a contraction
    real_randn_like = torch.randn_like
    torch.randn_like = lambda x: torch.sin(0.5 * x)
    try:
        with torch.no_grad():
            want = ref.p_sample_loop(
                _pseudo_model(), SHAPE, torch.tensor(z),
                clip_denoised=False, model_kwargs={}, device="cpu").numpy()
    finally:
        torch.randn_like = real_randn_like

    sched = make_schedule(num_sampling_steps=n_steps)
    got = np.asarray(p_sample_loop(
        _jnp_model, jnp.asarray(z), sched, rng=None, in_channels=C,
        noise_fn=lambda x, i: jnp.sin(0.5 * x)))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-4, rel
