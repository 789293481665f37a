"""Diffusion samplers as scan-based jittable loops."""

from viditq_tpu.samplers.gaussian_diffusion import (  # noqa: F401
    Schedule, make_schedule, ddim_sample_loop, p_sample_loop,
    training_losses, get_named_beta_schedule, space_timesteps)
from viditq_tpu.samplers.iddpm import IDDPM, default_qctx_factory  # noqa: F401
from viditq_tpu.samplers.dpm_solver import (  # noqa: F401
    DPMSolver, DPMSolverSampler, NoiseScheduleVP, dpm_solver_pp_2m)
from viditq_tpu.samplers.extra_solvers import (  # noqa: F401
    EDMSampler, LCMScheduler, SASolverSampler)
from viditq_tpu.samplers.sa_solver import SASolver  # noqa: F401
from viditq_tpu.samplers.diffusion_losses import (  # noqa: F401
    LossSecondMomentResampler, UniformSampler,
    create_named_schedule_sampler, discretized_gaussian_log_likelihood,
    normal_kl, training_losses_full, vb_terms)

from viditq_tpu.models.registry import SCHEDULERS, register

register(SCHEDULERS, "iddpm")(IDDPM)
register(SCHEDULERS, "dpm-solver")(DPMSolverSampler)
register(SCHEDULERS, "sa-solver")(SASolverSampler)
register(SCHEDULERS, "lcm")(LCMScheduler)
register(SCHEDULERS, "edm")(EDMSampler)
