"""Numerical parity of the DPM-Solver family vs the reference's own torch
solver (`t2i/diffusion/model/dpm_solver_alpha.py`, imported at test time as
an oracle from the read-only mount — nothing is copied).

A toy noise model with identical constants runs through both solvers for
every (method, order, algorithm_type, solver_type, skip_type) combination
the reference exposes.
"""

import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference/t2i/diffusion/model/dpm_solver_alpha.py"

pytestmark = [pytest.mark.heavy, pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference not mounted")]


def load_ref():
    spec = importlib.util.spec_from_file_location("ref_dpm_solver", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SHAPE = (2, 4, 8, 8)
RNG = np.random.default_rng(0)
X0 = RNG.standard_normal(SHAPE).astype(np.float32)
BIAS = RNG.standard_normal(SHAPE[1:]).astype(np.float32)


def _run_ref(mod, steps, order, method, algorithm_type, solver_type,
             skip_type, lower_order_final, thresholding=False,
             denoise_to_zero=False):
    import torch

    from viditq_tpu.samplers.gaussian_diffusion import get_named_beta_schedule

    betas = torch.tensor(get_named_beta_schedule("linear", 1000))
    ns = mod.NoiseScheduleVP("discrete", betas=betas)
    bias = torch.tensor(BIAS)

    def toy(x, t_input):
        return 0.1 * x + torch.cos(t_input / 100.0).reshape(
            -1, 1, 1, 1) * bias

    model_fn = mod.model_wrapper(toy, ns, model_type="noise",
                                 guidance_type="uncond")
    solver = mod.DPM_Solver(
        model_fn, ns, algorithm_type=algorithm_type,
        correcting_x0_fn="dynamic_thresholding" if thresholding else None)
    x = torch.tensor(X0)
    out = solver.sample(x, steps=steps, order=order, method=method,
                        skip_type=skip_type, solver_type=solver_type,
                        lower_order_final=lower_order_final,
                        denoise_to_zero=denoise_to_zero)
    return np.asarray(out)


def _run_ours(steps, order, method, algorithm_type, solver_type, skip_type,
              lower_order_final, thresholding=False, denoise_to_zero=False,
              capture=False):
    import jax.numpy as jnp

    from viditq_tpu.samplers.dpm_solver import DPMSolver, NoiseScheduleVP

    ns = NoiseScheduleVP()
    bias = jnp.asarray(BIAS)

    def toy(x, t_model, eval_idx):
        return 0.1 * x + jnp.cos(t_model / 100.0).reshape(-1, 1, 1, 1) * bias

    solver = DPMSolver(
        toy, ns, algorithm_type=algorithm_type, solver_type=solver_type,
        correcting_x0_fn="dynamic_thresholding" if thresholding else None)
    out = solver.sample(jnp.asarray(X0), steps=steps, order=order,
                        method=method, skip_type=skip_type,
                        lower_order_final=lower_order_final,
                        denoise_to_zero=denoise_to_zero,
                        capture_trajectory=capture)
    if capture:
        return np.asarray(out[0]), {k: np.asarray(v)
                                    for k, v in out[1].items()}
    return np.asarray(out)


CASES = [
    # (steps, order, method, algorithm_type, solver_type, skip_type, lof)
    (10, 1, "multistep", "dpmsolver++", "dpmsolver", "time_uniform", True),
    (10, 2, "multistep", "dpmsolver++", "dpmsolver", "time_uniform", True),
    (10, 3, "multistep", "dpmsolver++", "dpmsolver", "time_uniform", True),
    (10, 3, "multistep", "dpmsolver++", "dpmsolver", "time_uniform", False),
    (10, 3, "multistep", "dpmsolver", "dpmsolver", "time_uniform", True),
    (10, 2, "multistep", "dpmsolver++", "taylor", "time_uniform", True),
    (10, 3, "multistep", "dpmsolver", "taylor", "time_uniform", True),
    (10, 2, "multistep", "dpmsolver++", "dpmsolver", "logSNR", True),
    (10, 2, "multistep", "dpmsolver++", "dpmsolver", "time_quadratic", True),
    (10, 2, "singlestep", "dpmsolver++", "dpmsolver", "time_uniform", True),
    (9, 3, "singlestep", "dpmsolver++", "dpmsolver", "time_uniform", True),
    (10, 3, "singlestep", "dpmsolver", "dpmsolver", "time_uniform", True),
    (11, 3, "singlestep", "dpmsolver++", "taylor", "time_uniform", True),
    (9, 3, "singlestep_fixed", "dpmsolver++", "dpmsolver", "time_uniform",
     True),
]


@pytest.mark.parametrize(
    "steps,order,method,algo,stype,skip,lof", CASES,
    ids=[f"{m}-o{o}-{a}-{s}-{k}-lof{int(l)}"
         for _, o, m, a, s, k, l in CASES])
def test_solver_matches_reference(steps, order, method, algo, stype, skip,
                                  lof):
    ref = _run_ref(load_ref(), steps, order, method, algo, stype, skip, lof)
    ours = _run_ours(steps, order, method, algo, stype, skip, lof)
    # without lower_order_final the toy trajectory is unstable (|x| grows
    # ~100x — the very behavior LOF exists to prevent), amplifying float32
    # noise; loosen accordingly
    tol = 2e-4 if lof else 5e-3
    np.testing.assert_allclose(ours, ref, rtol=tol, atol=tol)


def test_dynamic_thresholding_matches_reference():
    ref = _run_ref(load_ref(), 10, 2, "multistep", "dpmsolver++",
                   "dpmsolver", "time_uniform", True, thresholding=True)
    ours = _run_ours(10, 2, "multistep", "dpmsolver++", "dpmsolver",
                     "time_uniform", True, thresholding=True)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_denoise_to_zero_matches_reference():
    ref = _run_ref(load_ref(), 10, 2, "multistep", "dpmsolver++",
                   "dpmsolver", "time_uniform", True, denoise_to_zero=True)
    ours = _run_ours(10, 2, "multistep", "dpmsolver++", "dpmsolver",
                     "time_uniform", True, denoise_to_zero=True)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_trajectory_capture_layout():
    """Calib capture: `steps` (x, t) pairs, the final state dropped —
    matching the reference's save_logs + get_calib_data slicing
    (t2i/scripts/get_calib_data.py:167-169). ts are model-input times."""
    _, traj = _run_ours(8, 3, "multistep", "dpmsolver++", "dpmsolver",
                        "time_uniform", True, capture=True)
    assert traj["xs"].shape == (8,) + SHAPE
    assert traj["ts"].shape == (8, SHAPE[0])
    assert traj["ts"][0, 0] == pytest.approx(999.0, abs=1e-3)
    # singlestep capture: one pair per outer update
    _, traj = _run_ours(9, 3, "singlestep", "dpmsolver++", "dpmsolver",
                        "time_uniform", True, capture=True)
    assert traj["xs"].shape[0] == traj["ts"].shape[0]
