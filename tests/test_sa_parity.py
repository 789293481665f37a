"""Numerical parity of the SA-Solver vs the reference's own torch solver
(`t2i/diffusion/model/sa_solver.py`, imported at test time as an oracle from
the read-only mount — nothing is copied).

A toy noise model with identical constants runs through both solvers across
(mode, predictor_order, corrector_order, pc_mode, skip_type, tau) — the full
family the reference's sa_sampler exposes, including the tau-stochastic path
(with noise pinned to zero on both sides so the deterministic drift
coefficients are compared exactly).
"""

import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference/t2i/diffusion/model/sa_solver.py"

pytestmark = [pytest.mark.heavy, pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference not mounted")]


def load_ref():
    spec = importlib.util.spec_from_file_location("ref_sa_solver", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SHAPE = (2, 4, 8, 8)
RNG = np.random.default_rng(0)
X0 = RNG.standard_normal(SHAPE).astype(np.float32)
BIAS = RNG.standard_normal(SHAPE[1:]).astype(np.float32)


def _run_ref(mode, steps, po, co, pc_mode, skip_type, tau, thresholding=False,
             algorithm_type="data_prediction"):
    import torch

    from viditq_tpu.samplers.gaussian_diffusion import get_named_beta_schedule

    mod = load_ref()
    betas = torch.tensor(get_named_beta_schedule("linear", 1000))
    ns = mod.NoiseScheduleVP("discrete", betas=betas)
    bias = torch.tensor(BIAS)

    def toy(x, t_cont):
        # model_fn(x, t_expanded): t is CONTINUOUS in the SASolver convention
        return 0.1 * x + torch.cos(t_cont * 5.0).reshape(-1, 1, 1, 1) * bias

    solver = mod.SASolver(
        toy, ns, algorithm_type=algorithm_type,
        correcting_x0_fn="dynamic_thresholding" if thresholding else None)
    x = torch.tensor(X0)
    out = solver.sample(mode=mode, x=x, tau=tau, steps=steps,
                        skip_type=skip_type, skip_order=1,
                        predictor_order=po, corrector_order=co,
                        pc_mode=pc_mode)
    return np.asarray(out)


def _run_ours(mode, steps, po, co, pc_mode, skip_type, tau,
              thresholding=False, algorithm_type="data_prediction",
              capture=False, zero_noise=True):
    import jax.numpy as jnp

    from viditq_tpu.samplers.dpm_solver import NoiseScheduleVP
    from viditq_tpu.samplers.sa_solver import SASolver

    ns = NoiseScheduleVP()
    bias = jnp.asarray(BIAS)

    def toy(x, t_model, eval_idx):
        t_cont = t_model / 1000.0 + 1.0 / ns.total_N
        return 0.1 * x + jnp.cos(t_cont * 5.0).reshape(-1, 1, 1, 1) * bias

    solver = SASolver(
        toy, ns, algorithm_type=algorithm_type,
        correcting_x0_fn="dynamic_thresholding" if thresholding else None)
    out = solver.sample(
        jnp.asarray(X0), tau=tau, steps=steps, skip_type=skip_type,
        skip_order=1, predictor_order=po, corrector_order=co,
        pc_mode=pc_mode, mode=mode, capture_trajectory=capture,
        _noise_fn=((lambda k, s, d: jnp.zeros(s, d)) if zero_noise
                   else None))
    if capture:
        return np.asarray(out[0]), {k: np.asarray(v)
                                    for k, v in out[1].items()}
    return np.asarray(out)


CASES = [
    # (mode, steps, predictor_order, corrector_order, pc_mode, skip_type)
    ("few_steps", 8, 2, 2, "PEC", "time"),      # sa_sampler.py:93 defaults
    ("few_steps", 10, 3, 4, "PEC", "time"),
    ("few_steps", 10, 3, 4, "PECE", "time"),
    ("few_steps", 10, 4, 4, "PEC", "time"),
    ("few_steps", 10, 3, 0, "PEC", "time"),     # predictor-only
    ("few_steps", 10, 3, 4, "PEC", "logSNR"),
    ("few_steps", 10, 3, 4, "PEC", "karras"),
    ("more_steps", 10, 3, 4, "PEC", "time"),
    ("more_steps", 10, 2, 2, "PECE", "time"),
]


@pytest.mark.parametrize(
    "mode,steps,po,co,pc,skip", CASES,
    ids=[f"{m}-p{p}c{c}-{pc}-{s}" for m, _, p, c, pc, s in CASES])
def test_deterministic_matches_reference(mode, steps, po, co, pc, skip):
    ref = _run_ref(mode, steps, po, co, pc, skip, tau=lambda t: 0.0)
    ours = _run_ours(mode, steps, po, co, pc, skip, tau=0.0)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_tau_stochastic_drift_matches_reference(monkeypatch):
    """tau > 0 engages the stochastic coefficients: exp(-tau^2 h) state
    decay, (1+tau^2)-weighted gradient integrals and the reference tau
    schedule tau(t) = eta on [0.2, 0.8]. Noise pinned to zero on both sides
    isolates the drift terms for an exact comparison."""
    import torch

    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **kw: torch.zeros_like(x))
    tau_t = lambda t: 0.6 if 0.2 <= t <= 0.8 else 0.0  # noqa: E731
    ref = _run_ref("few_steps", 10, 3, 4, "PEC", "time", tau=tau_t)
    ours = _run_ours("few_steps", 10, 3, 4, "PEC", "time", tau=tau_t)
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)


def test_tau_noise_injection_scale():
    """With real noise, tau>0 must actually perturb the trajectory and the
    perturbation must carry the noise_scale (non-zero only on tau steps)."""
    det = _run_ours("few_steps", 10, 3, 4, "PEC", "time", tau=0.0,
                    zero_noise=False)
    sto = _run_ours("few_steps", 10, 3, 4, "PEC", "time", tau=0.7,
                    zero_noise=False)
    assert not np.allclose(det, sto)
    assert np.isfinite(sto).all()


def test_noise_prediction_matches_reference():
    ref = _run_ref("few_steps", 10, 2, 2, "PEC", "time", tau=lambda t: 0.0,
                   algorithm_type="noise_prediction")
    ours = _run_ours("few_steps", 10, 2, 2, "PEC", "time", tau=0.0,
                     algorithm_type="noise_prediction")
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_thresholding_matches_reference():
    ref = _run_ref("few_steps", 10, 2, 2, "PEC", "time", tau=lambda t: 0.0,
                   thresholding=True)
    ours = _run_ours("few_steps", 10, 2, 2, "PEC", "time", tau=0.0,
                     thresholding=True)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_trajectory_capture_layout():
    _, traj = _run_ours("few_steps", 8, 3, 4, "PEC", "time", tau=0.0,
                        capture=True)
    assert traj["xs"].shape == (8,) + SHAPE
    assert traj["ts"].shape == (8, SHAPE[0])
    assert traj["ts"][0, 0] == pytest.approx(999.0, abs=1e-3)


def test_sampler_wrapper_runs():
    """SASolverSampler CFG wrapper (the registry entry point) end-to-end."""
    import jax.numpy as jnp

    from viditq_tpu.samplers.extra_solvers import SASolverSampler

    B, c = 2, 4
    z = jnp.asarray(RNG.standard_normal((B, c, 8, 8)), jnp.float32)
    y = jnp.asarray(RNG.standard_normal((2 * B, 1, 3, 16)), jnp.float32)

    def model_apply(x, t, yy, mask, qctx):
        return 0.1 * x + 0.01 * yy.mean() * jnp.ones_like(x)

    smp = SASolverSampler(num_sampling_steps=6, cfg_scale=4.0, eta=0.0,
                          predictor_order=2, corrector_order=2)
    out = smp.sample(model_apply, z, y)
    assert out.shape == z.shape
    assert np.isfinite(np.asarray(out)).all()
