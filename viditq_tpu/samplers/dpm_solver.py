"""The full DPM-Solver family for discrete/continuous VP diffusion models.

TPU-native counterpart of the reference's vendored solvers
(`t2v/opensora/schedulers/dpms/dpm_solver.py` 1570 LoC,
`t2i/diffusion/model/dpm_solver_alpha.py` / `dpm_solver_sigma.py` 1339 LoC
each — the alpha and sigma files are byte-identical; the "duality" is two
entry names over one implementation, which this module mirrors).

Feature parity: NoiseScheduleVP ('discrete' with betas or alphas_cumprod +
numerical logSNR clipping, and the continuous 'linear' VPSDE), model types
noise / x_start / v / score, algorithm types dpmsolver / dpmsolver++, solver
types dpmsolver / taylor, multistep orders 1-3 with warmup and
lower_order_final, singlestep ("DPM-Solver-fast") and singlestep_fixed with
orders 1-3, skip types time_uniform / logSNR / time_quadratic, dynamic
thresholding (Imagen), denoise_to_zero, and in-solver calibration-trajectory
capture (`save_logs`, dpm_solver_alpha.py:1282-1285).

TPU-first redesign (NOT a port of the reference's per-step python loop):
every update of every order is *linear* in the buffered model outputs once
the timestep grid is fixed, so all per-step solver coefficients are
precomputed host-side in numpy float64 — a solver *tableau* — by probing the
reference update equations with unit model values. The jitted sampling loop
is then a single `lax.scan` whose body is one model evaluation plus a
4-term linear combination; multistep warmup, lower-order tails and mixed
singlestep orders are coefficient patterns, not traced control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from viditq_tpu.samplers.gaussian_diffusion import get_named_beta_schedule


class NoiseScheduleVP:
    """VP forward-SDE wrapper (reference dpm_solver_alpha.py:5-170).

    'discrete': piecewise-linear interpolated log_alpha over t in (0, 1],
    from betas or alphas_cumprod, with the numerical logSNR clip near t=T
    (`numerical_clip_alpha`, clipped_lambda=-5.1).
    'linear': the continuous VPSDE schedule (ScoreSDE defaults).
    """

    def __init__(self, betas: Optional[np.ndarray] = None,
                 diffusion_steps: int = 1000, schedule: str = "discrete",
                 alphas_cumprod: Optional[np.ndarray] = None,
                 continuous_beta_0: float = 0.1,
                 continuous_beta_1: float = 20.0):
        if schedule not in ("discrete", "linear"):
            raise ValueError(f"unsupported schedule {schedule!r}")
        self.schedule = schedule
        self.T = 1.0
        if schedule == "discrete":
            if alphas_cumprod is not None:
                log_alphas = 0.5 * np.log(
                    np.asarray(alphas_cumprod, np.float64))
            else:
                if betas is None:
                    betas = get_named_beta_schedule("linear", diffusion_steps)
                log_alphas = 0.5 * np.log1p(
                    -np.asarray(betas, np.float64)).cumsum()
            log_alphas = self._numerical_clip_alpha(log_alphas)
            self.total_N = len(log_alphas)
            self.t_array = (np.arange(self.total_N) + 1.0) / self.total_N
            self.log_alpha_array = log_alphas
        else:
            self.total_N = 1000
            self.beta_0 = float(continuous_beta_0)
            self.beta_1 = float(continuous_beta_1)

    @staticmethod
    def _numerical_clip_alpha(log_alphas: np.ndarray,
                              clipped_lambda: float = -5.1) -> np.ndarray:
        """Clip the schedule where logSNR < -5.1 near t=T (cosine-schedule
        stability trick, dpm_solver_alpha.py:114-126)."""
        log_sigmas = 0.5 * np.log(1.0 - np.exp(2.0 * log_alphas))
        lambs = log_alphas - log_sigmas
        idx = int(np.searchsorted(lambs[::-1], clipped_lambda))
        if idx > 0:
            log_alphas = log_alphas[:-idx]
        return log_alphas

    # ---- traced (jnp) variants, used by samplers that evaluate at trace
    # time (SA-Solver etc.) ----

    def marginal_log_mean_coeff(self, t):
        if self.schedule == "discrete":
            return jnp.interp(t, jnp.asarray(self.t_array, jnp.float32),
                              jnp.asarray(self.log_alpha_array, jnp.float32))
        return -0.25 * t ** 2 * (self.beta_1 - self.beta_0) \
            - 0.5 * t * self.beta_0

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_alpha = self.marginal_log_mean_coeff(t)
        return log_alpha - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_alpha))

    def inverse_lambda(self, lamb):
        if self.schedule == "linear":
            tmp = 2.0 * (self.beta_1 - self.beta_0) * jnp.logaddexp(
                -2.0 * lamb, 0.0)
            delta = self.beta_0 ** 2 + tmp
            return tmp / (jnp.sqrt(delta) + self.beta_0) \
                / (self.beta_1 - self.beta_0)
        log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * lamb)
        return jnp.interp(
            log_alpha,
            jnp.asarray(self.log_alpha_array[::-1].copy(), jnp.float32),
            jnp.asarray(self.t_array[::-1].copy(), jnp.float32))

    # ---- host-side (numpy float64) variants for tableau construction ----

    def _log_mean_coeff_np(self, t):
        t = np.asarray(t, np.float64)
        if self.schedule == "discrete":
            return np.interp(t, self.t_array, self.log_alpha_array)
        return -0.25 * t ** 2 * (self.beta_1 - self.beta_0) \
            - 0.5 * t * self.beta_0

    def _alpha_np(self, t):
        return np.exp(self._log_mean_coeff_np(t))

    def _std_np(self, t):
        return np.sqrt(1.0 - np.exp(2.0 * self._log_mean_coeff_np(t)))

    def _lambda_np(self, t):
        la = self._log_mean_coeff_np(t)
        return la - 0.5 * np.log(1.0 - np.exp(2.0 * la))

    def _inverse_lambda_np(self, lamb):
        lamb = np.asarray(lamb, np.float64)
        if self.schedule == "linear":
            tmp = 2.0 * (self.beta_1 - self.beta_0) * np.logaddexp(
                -2.0 * lamb, 0.0)
            delta = self.beta_0 ** 2 + tmp
            return tmp / (np.sqrt(delta) + self.beta_0) \
                / (self.beta_1 - self.beta_0)
        log_alpha = -0.5 * np.logaddexp(0.0, -2.0 * lamb)
        return np.interp(log_alpha, self.log_alpha_array[::-1],
                         self.t_array[::-1])


def model_input_timestep(t_cont, total_n: int = 1000):
    """Continuous t in (0,1] -> discrete model-input time, reference
    `get_model_input_time` (dpm_solver_alpha.py:273-283): scaled by 1000
    regardless of total_N — t_input in [0, 1000*(N-1)/N]."""
    return (t_cont - 1.0 / total_n) * 1000.0


def get_time_steps(ns: NoiseScheduleVP, skip_type: str, t_T: float,
                   t_0: float, N: int) -> np.ndarray:
    """Timestep grid [N+1], host-side (dpm_solver_alpha.py:455-484)."""
    if skip_type == "logSNR":
        lam_T = ns._lambda_np(t_T)
        lam_0 = ns._lambda_np(t_0)
        return ns._inverse_lambda_np(np.linspace(lam_T, lam_0, N + 1))
    if skip_type == "time_uniform":
        return np.linspace(t_T, t_0, N + 1)
    if skip_type == "time_quadratic":
        return np.linspace(t_T ** 0.5, t_0 ** 0.5, N + 1) ** 2
    raise ValueError(f"unsupported skip_type {skip_type!r}")


def get_orders_and_timesteps_for_singlestep(
        ns: NoiseScheduleVP, steps: int, order: int, skip_type: str,
        t_T: float, t_0: float):
    """"DPM-Solver-fast" order schedule (dpm_solver_alpha.py:485-543)."""
    if order == 3:
        K = steps // 3 + 1
        if steps % 3 == 0:
            orders = [3] * (K - 2) + [2, 1]
        elif steps % 3 == 1:
            orders = [3] * (K - 1) + [1]
        else:
            orders = [3] * (K - 1) + [2]
    elif order == 2:
        K = steps // 2 if steps % 2 == 0 else steps // 2 + 1
        orders = [2] * K if steps % 2 == 0 else [2] * (K - 1) + [1]
    elif order == 1:
        K = 1
        orders = [1] * steps
    else:
        raise ValueError("order must be 1, 2 or 3")
    if skip_type == "logSNR":
        timesteps_outer = get_time_steps(ns, skip_type, t_T, t_0, K)
    else:
        grid = get_time_steps(ns, skip_type, t_T, t_0, steps)
        timesteps_outer = grid[np.cumsum([0] + orders)]
    return timesteps_outer, orders


# ---------------------------------------------------------------------------
# Host-side reference update equations (numpy float64, scalar model values).
#
# These transcribe the reference's multistep/singlestep update formulas
# (dpm_solver_alpha.py:551-968) with scalar m's; linearity in the m's lets
# `_probe` extract exact per-step coefficients by evaluating at unit values.
# ---------------------------------------------------------------------------

def _ms_update_scalar(ns, t_prev_list, t, order, m, algorithm_type,
                      solver_type):
    """x_t = cx * x + sum_i a_i * m_i with x = 0: returns the m-part.
    m = (m0, m1, m2), m0 most recent (reference model_prev_list[-1])."""
    m0, m1, m2 = m
    t0 = t_prev_list[-1]
    lam_t = ns._lambda_np(t)
    lam_0 = ns._lambda_np(t0)
    h = lam_t - lam_0
    sigma_t = ns._std_np(t)
    alpha_t = ns._alpha_np(t)
    if order >= 2:
        t1 = t_prev_list[-2]
        h_0 = lam_0 - ns._lambda_np(t1)
        r0 = h_0 / h
        d1_0 = (1.0 / r0) * (m0 - m1)
    if order >= 3:
        t2 = t_prev_list[-3]
        h_1 = ns._lambda_np(t1) - ns._lambda_np(t2)
        r1 = h_1 / h
        d1_1 = (1.0 / r1) * (m1 - m2)
        d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
        d2 = (1.0 / (r0 + r1)) * (d1_0 - d1_1)
    if algorithm_type == "dpmsolver++":
        phi_1 = np.expm1(-h)
        if order == 1:
            return -alpha_t * phi_1 * m0
        if order == 2:
            if solver_type == "dpmsolver":
                return -alpha_t * phi_1 * m0 \
                    - 0.5 * alpha_t * phi_1 * d1_0
            return -alpha_t * phi_1 * m0 \
                + alpha_t * (phi_1 / h + 1.0) * d1_0
        phi_2 = phi_1 / h + 1.0
        phi_3 = phi_2 / h - 0.5
        return (-alpha_t * phi_1 * m0 + alpha_t * phi_2 * d1
                - alpha_t * phi_3 * d2)
    # dpmsolver (noise prediction)
    phi_1 = np.expm1(h)
    if order == 1:
        return -sigma_t * phi_1 * m0
    if order == 2:
        if solver_type == "dpmsolver":
            return -sigma_t * phi_1 * m0 - 0.5 * sigma_t * phi_1 * d1_0
        return -sigma_t * phi_1 * m0 - sigma_t * (phi_1 / h - 1.0) * d1_0
    phi_2 = phi_1 / h - 1.0
    phi_3 = phi_2 / h - 0.5
    return (-sigma_t * phi_1 * m0 - sigma_t * phi_2 * d1
            - sigma_t * phi_3 * d2)


def _ms_cx(ns, t_prev0, t, algorithm_type):
    if algorithm_type == "dpmsolver++":
        return ns._std_np(t) / ns._std_np(t_prev0)
    return np.exp(ns._log_mean_coeff_np(t) - ns._log_mean_coeff_np(t_prev0))


def _probe(fn, n: int):
    """Extract linear coefficients of fn(m) (linear, fn(0)=0) over n slots."""
    coeffs = []
    for i in range(n):
        m = [0.0, 0.0, 0.0]
        m[i] = 1.0
        coeffs.append(float(fn(tuple(m))))
    return coeffs


def multistep_coeffs(ns, t_prev_list, t, order, algorithm_type,
                     solver_type):
    """(cx, a0, a1, a2) for one multistep update of the given order."""
    cx = float(_ms_cx(ns, t_prev_list[-1], t, algorithm_type))
    a = _probe(lambda m: _ms_update_scalar(
        ns, t_prev_list, t, order, m, algorithm_type, solver_type), 3)
    return cx, a[0], a[1], a[2]


@dataclasses.dataclass
class SinglestepCoeffs:
    """Static coefficients for one singlestep group of order k
    (dpm_solver_alpha.py:551-803). Level j computes
    x_j = cx[j] * x + sum_i b[j][i] * m_i and the next model eval happens at
    eval_t[j]; the last level is the group output."""

    order: int
    eval_t: Sequence[float]     # continuous times of the k model evals
    cx: Sequence[float]         # per level (k levels incl. output)
    b: Sequence[Sequence[float]]


def singlestep_coeffs(ns, s: float, t: float, order: int, algorithm_type,
                      solver_type, skip_type: str) -> SinglestepCoeffs:
    """Probe the singlestep update equations at (s -> t).

    r1/r2 come from the inner logSNR spacing of get_time_steps over [s, t]
    (reference sample(), dpm_solver_alpha.py:1259-1264).
    """
    ts_inner = get_time_steps(ns, skip_type, s, t, order)
    lam_inner = ns._lambda_np(ts_inner)
    h = lam_inner[-1] - lam_inner[0]
    lam_s = ns._lambda_np(s)
    lam_t = ns._lambda_np(t)
    H = lam_t - lam_s

    if order == 1:
        cx = _ms_cx(ns, s, t, algorithm_type)
        if algorithm_type == "dpmsolver++":
            a0 = -ns._alpha_np(t) * np.expm1(-H)
        else:
            a0 = -ns._std_np(t) * np.expm1(H)
        return SinglestepCoeffs(order=1, eval_t=[s], cx=[float(cx)],
                                b=[[float(a0), 0.0, 0.0]])

    r1 = float((lam_inner[1] - lam_inner[0]) / h)
    s1 = float(ns._inverse_lambda_np(lam_s + r1 * H))
    if order == 2:
        # level 1: x_s1; level 2: x_t (dpm_solver_alpha.py:598-679)
        if algorithm_type == "dpmsolver++":
            phi_11 = np.expm1(-r1 * H)
            phi_1 = np.expm1(-H)
            cx1 = ns._std_np(s1) / ns._std_np(s)
            b1 = [-ns._alpha_np(s1) * phi_11, 0.0, 0.0]
            cx2 = ns._std_np(t) / ns._std_np(s)
            if solver_type == "dpmsolver":
                a_s = -ns._alpha_np(t) * phi_1 \
                    + (0.5 / r1) * ns._alpha_np(t) * phi_1
                a_s1 = -(0.5 / r1) * ns._alpha_np(t) * phi_1
            else:
                k = (1.0 / r1) * ns._alpha_np(t) * (phi_1 / H + 1.0)
                a_s = -ns._alpha_np(t) * phi_1 - k
                a_s1 = k
        else:
            phi_11 = np.expm1(r1 * H)
            phi_1 = np.expm1(H)
            la = ns._log_mean_coeff_np
            cx1 = np.exp(la(s1) - la(s))
            b1 = [-ns._std_np(s1) * phi_11, 0.0, 0.0]
            cx2 = np.exp(la(t) - la(s))
            if solver_type == "dpmsolver":
                a_s = -ns._std_np(t) * phi_1 + (0.5 / r1) * ns._std_np(t) * phi_1
                a_s1 = -(0.5 / r1) * ns._std_np(t) * phi_1
            else:
                k = (1.0 / r1) * ns._std_np(t) * (phi_1 / H - 1.0)
                a_s = -ns._std_np(t) * phi_1 + k
                a_s1 = -k
        return SinglestepCoeffs(
            order=2, eval_t=[s, s1],
            cx=[float(cx1), float(cx2)],
            b=[[float(b1[0]), 0.0, 0.0], [float(a_s), float(a_s1), 0.0]])

    r2 = float((lam_inner[2] - lam_inner[0]) / h)
    s2 = float(ns._inverse_lambda_np(lam_s + r2 * H))
    la = ns._log_mean_coeff_np
    if algorithm_type == "dpmsolver++":
        phi_11 = np.expm1(-r1 * H)
        phi_12 = np.expm1(-r2 * H)
        phi_1 = np.expm1(-H)
        phi_22 = np.expm1(-r2 * H) / (r2 * H) + 1.0
        phi_2 = phi_1 / H + 1.0
        phi_3 = phi_2 / H - 0.5
        cx1 = ns._std_np(s1) / ns._std_np(s)
        b1 = [-ns._alpha_np(s1) * phi_11, 0.0, 0.0]
        cx2 = ns._std_np(s2) / ns._std_np(s)
        k22 = (r2 / r1) * ns._alpha_np(s2) * phi_22
        b2 = [-ns._alpha_np(s2) * phi_12 - k22, k22, 0.0]
        cx3 = ns._std_np(t) / ns._std_np(s)
        if solver_type == "dpmsolver":
            k2 = (1.0 / r2) * ns._alpha_np(t) * phi_2
            b3 = [-ns._alpha_np(t) * phi_1 - k2, 0.0, k2]
        else:
            # taylor (dpm_solver_alpha.py:756-765)
            A = ns._alpha_np(t)
            # D1 = (r2*D1_0 - r1*D1_1)/(r2-r1); D2 = 2(D1_1-D1_0)/(r2-r1)
            # D1_0 = (m1-m0)/r1, D1_1 = (m2-m0)/r2
            c10 = 1.0 / r1
            c11 = 1.0 / r2
            d1_m0 = (r2 * (-c10) - r1 * (-c11)) / (r2 - r1)
            d1_m1 = (r2 * c10) / (r2 - r1)
            d1_m2 = (-r1 * c11) / (r2 - r1)
            d2_m0 = 2.0 * ((-c11) - (-c10)) / (r2 - r1)
            d2_m1 = 2.0 * (-c10) / (r2 - r1)
            d2_m2 = 2.0 * c11 / (r2 - r1)
            b3 = [-A * phi_1 + A * phi_2 * d1_m0 - A * phi_3 * d2_m0,
                  A * phi_2 * d1_m1 - A * phi_3 * d2_m1,
                  A * phi_2 * d1_m2 - A * phi_3 * d2_m2]
    else:
        phi_11 = np.expm1(r1 * H)
        phi_12 = np.expm1(r2 * H)
        phi_1 = np.expm1(H)
        phi_22 = np.expm1(r2 * H) / (r2 * H) - 1.0
        phi_2 = phi_1 / H - 1.0
        phi_3 = phi_2 / H - 0.5
        cx1 = np.exp(la(s1) - la(s))
        b1 = [-ns._std_np(s1) * phi_11, 0.0, 0.0]
        cx2 = np.exp(la(s2) - la(s))
        k22 = (r2 / r1) * ns._std_np(s2) * phi_22
        b2 = [-ns._std_np(s2) * phi_12 + k22, -k22, 0.0]
        cx3 = np.exp(la(t) - la(s))
        if solver_type == "dpmsolver":
            k2 = (1.0 / r2) * ns._std_np(t) * phi_2
            b3 = [-ns._std_np(t) * phi_1 + k2, 0.0, -k2]
        else:
            S = ns._std_np(t)
            c10 = 1.0 / r1
            c11 = 1.0 / r2
            d1_m0 = (r2 * (-c10) - r1 * (-c11)) / (r2 - r1)
            d1_m1 = (r2 * c10) / (r2 - r1)
            d1_m2 = (-r1 * c11) / (r2 - r1)
            d2_m0 = 2.0 * ((-c11) - (-c10)) / (r2 - r1)
            d2_m1 = 2.0 * (-c10) / (r2 - r1)
            d2_m2 = 2.0 * c11 / (r2 - r1)
            b3 = [-S * phi_1 - S * phi_2 * d1_m0 - S * phi_3 * d2_m0,
                  -S * phi_2 * d1_m1 - S * phi_3 * d2_m1,
                  -S * phi_2 * d1_m2 - S * phi_3 * d2_m2]
    return SinglestepCoeffs(
        order=3, eval_t=[s, s1, s2],
        cx=[float(cx1), float(cx2), float(cx3)],
        b=[[float(v) for v in b1], [float(v) for v in b2],
           [float(v) for v in b3]])


class DPMSolver:
    """Tableau-driven DPM-Solver (reference DPM_Solver,
    dpm_solver_alpha.py:339-1280).

    noise_model_fn(x, t_model [B] float32, eval_idx int32) -> eps prediction.
    """

    def __init__(self, noise_model_fn: Callable, ns: NoiseScheduleVP,
                 algorithm_type: str = "dpmsolver++",
                 solver_type: str = "dpmsolver",
                 correcting_x0_fn: Optional[str] = None,
                 thresholding_max_val: float = 1.0,
                 dynamic_thresholding_ratio: float = 0.995):
        assert algorithm_type in ("dpmsolver", "dpmsolver++")
        assert solver_type in ("dpmsolver", "taylor")
        self.noise_model_fn = noise_model_fn
        self.ns = ns
        self.algorithm_type = algorithm_type
        self.solver_type = solver_type
        self.thresholding = correcting_x0_fn == "dynamic_thresholding"
        self.thresholding_max_val = thresholding_max_val
        self.dynamic_thresholding_ratio = dynamic_thresholding_ratio

    # -- model-value function: eps for dpmsolver, (corrected) x0 for ++ --

    def _model_value(self, x, t_cont: float, eval_idx):
        B = x.shape[0]
        t_model = jnp.full((B,), model_input_timestep(t_cont, self.ns.total_N),
                           jnp.float32)
        eps = self.noise_model_fn(x, t_model, eval_idx)
        if self.algorithm_type == "dpmsolver":
            return eps
        alpha = float(self.ns._alpha_np(t_cont))
        sigma = float(self.ns._std_np(t_cont))
        x0 = (x - sigma * eps) / alpha
        if self.thresholding:
            p = self.dynamic_thresholding_ratio
            s = jnp.quantile(jnp.abs(x0).reshape(x0.shape[0], -1), p, axis=1)
            s = jnp.maximum(s, self.thresholding_max_val).reshape(
                (-1,) + (1,) * (x0.ndim - 1))
            x0 = jnp.clip(x0, -s, s) / s
        return x0

    # ------------------------------------------------------------------

    def sample(self, x: jnp.ndarray, steps: int = 20,
               t_start: Optional[float] = None, t_end: Optional[float] = None,
               order: int = 2, skip_type: str = "time_uniform",
               method: str = "multistep", lower_order_final: bool = True,
               denoise_to_zero: bool = False,
               capture_trajectory: bool = False):
        t_0 = 1.0 / self.ns.total_N if t_end is None else t_end
        t_T = self.ns.T if t_start is None else t_start
        assert t_0 > 0 and t_T > 0
        if method == "multistep":
            out = self._sample_multistep(x, steps, t_T, t_0, order,
                                         skip_type, lower_order_final,
                                         capture_trajectory)
        elif method in ("singlestep", "singlestep_fixed"):
            out = self._sample_singlestep(x, steps, t_T, t_0, order,
                                          skip_type, method,
                                          capture_trajectory)
        else:
            raise ValueError(f"unsupported method {method!r}")
        x, traj, n_evals = out
        if denoise_to_zero:
            # final first-order denoise (denoise_to_zero_fn :545-549);
            # under 'dpmsolver' the model value is eps, so convert to x0.
            eps_or_x0 = self._model_value(x, t_0, jnp.asarray(n_evals,
                                                              jnp.int32))
            if self.algorithm_type == "dpmsolver":
                alpha = float(self.ns._alpha_np(t_0))
                sigma = float(self.ns._std_np(t_0))
                x = (x - sigma * eps_or_x0) / alpha
            else:
                x = eps_or_x0
        if capture_trajectory:
            return x, traj
        return x

    def _sample_multistep(self, x, steps, t_T, t_0, order, skip_type,
                          lower_order_final, capture):
        assert steps >= order
        ns = self.ns
        ts = get_time_steps(ns, skip_type, t_T, t_0, steps)  # [steps+1]
        t_models = model_input_timestep(ts, ns.total_N)

        # per-step orders: warmup 1..order-1, steady `order`,
        # lower-order tail (sample(), dpm_solver_alpha.py:1205-1243)
        orders = []
        for step in range(1, steps + 1):
            o = min(order, step)
            if lower_order_final:
                o = min(o, steps + 1 - step)
            orders.append(o)

        # tableau [steps, 4]: cx, a0, a1, a2 per update
        tab = np.zeros((steps, 4), np.float64)
        for i, o in enumerate(orders):
            step = i + 1
            t_prev = [ts[max(step - 1 - j, 0)] for j in range(2, -1, -1)]
            cx, a0, a1, a2 = multistep_coeffs(
                ns, t_prev, ts[step], o, self.algorithm_type,
                self.solver_type)
            tab[i] = (cx, a0, a1, a2)

        m0 = self._model_value(x, float(ts[0]), jnp.asarray(0, jnp.int32))
        buf = (m0, m0, m0)  # m0 most recent; stale slots have zero coeffs
        tab_j = jnp.asarray(tab, jnp.float32)
        tm_j = jnp.asarray(t_models, jnp.float32)
        B = x.shape[0]
        traj0 = (x, jnp.full((B,), t_models[0], jnp.float32))

        def body(carry, i):
            x, b0, b1, b2 = carry
            c = tab_j[i]
            x_new = (c[0] * x + c[1] * b0 + c[2] * b1 + c[3] * b2
                     ).astype(x.dtype)
            # model eval at the new time (skipped for the final step, which
            # runs outside the scan)
            m_new = self._model_value_traced(x_new, tm_j[i + 1], i + 1)
            out = ((x_new, jnp.full((B,), tm_j[i + 1], jnp.float32))
                   if capture else None)
            return (x_new, m_new, b0, b1), out

        if steps > 1:
            (x, b0, b1, b2), traj = jax.lax.scan(
                body, (x, buf[0], buf[1], buf[2]),
                jnp.arange(0, steps - 1))
        else:
            b0, b1, b2 = buf
            traj = None
        # final update (no trailing model eval, :1240-1242)
        c = tab[steps - 1]
        x = (c[0] * x + c[1] * b0 + c[2] * b1 + c[3] * b2).astype(x.dtype)
        trajectory = None
        if capture:
            xs = [traj0[0][None]]
            tss = [traj0[1][None]]
            if traj is not None:
                xs.append(traj[0])
                tss.append(traj[1])
            trajectory = {"xs": jnp.concatenate(xs, axis=0),
                          "ts": jnp.concatenate(tss, axis=0)}
        return x, trajectory, steps

    def _model_value_traced(self, x, t_model_scalar, eval_idx):
        """Like _model_value but with a traced (scanned) t; alpha/sigma are
        recovered from the traced continuous time via jnp interp."""
        B = x.shape[0]
        t_model = jnp.full((B,), t_model_scalar, jnp.float32)
        eps = self.noise_model_fn(x, t_model,
                                  jnp.asarray(eval_idx, jnp.int32))
        if self.algorithm_type == "dpmsolver":
            return eps
        t_cont = t_model_scalar / 1000.0 + 1.0 / self.ns.total_N
        alpha = self.ns.marginal_alpha(t_cont)
        sigma = self.ns.marginal_std(t_cont)
        x0 = (x - sigma * eps) / alpha
        if self.thresholding:
            p = self.dynamic_thresholding_ratio
            s = jnp.quantile(jnp.abs(x0).reshape(x0.shape[0], -1), p, axis=1)
            s = jnp.maximum(s, self.thresholding_max_val).reshape(
                (-1,) + (1,) * (x0.ndim - 1))
            x0 = jnp.clip(x0, -s, s) / s
        return x0

    def _sample_singlestep(self, x, steps, t_T, t_0, order, skip_type,
                           method, capture):
        ns = self.ns
        if method == "singlestep":
            ts_outer, orders = get_orders_and_timesteps_for_singlestep(
                ns, steps, order, skip_type, t_T, t_0)
        else:
            K = steps // order
            orders = [order] * K
            ts_outer = get_time_steps(ns, skip_type, t_T, t_0, K)

        groups = [singlestep_coeffs(ns, float(ts_outer[i]),
                                    float(ts_outer[i + 1]), o,
                                    self.algorithm_type, self.solver_type,
                                    skip_type)
                  for i, o in enumerate(orders)]

        B = x.shape[0]
        xs_cap, ts_cap = [], []
        if capture:
            xs_cap.append(x[None])
            ts_cap.append(jnp.full(
                (1, B), model_input_timestep(float(ts_outer[0]), ns.total_N),
                jnp.float32))
        eval_idx = 0
        # group runs of equal order into scans over stacked coefficients
        i = 0
        while i < len(groups):
            j = i
            while j < len(groups) and groups[j].order == groups[i].order:
                j += 1
            run = groups[i:j]
            k = run[0].order
            cx = jnp.asarray([g.cx for g in run], jnp.float32)   # [R, k]
            b = jnp.asarray([g.b for g in run], jnp.float32)     # [R, k, 3]
            et = jnp.asarray(
                [[model_input_timestep(t, ns.total_N) for t in g.eval_t]
                 for g in run], jnp.float32)                     # [R, k]
            out_t = jnp.asarray(
                [model_input_timestep(float(ts_outer[i + r + 1]), ns.total_N)
                 for r in range(len(run))], jnp.float32)
            base_idx = eval_idx

            def body(x, r, cx=cx, b=b, et=et, out_t=out_t, k=k,
                     base_idx=base_idx):
                ms = []
                xi = x
                for lvl in range(k):
                    m = self._model_value_traced(
                        xi, et[r, lvl], base_idx + r * k + lvl)
                    ms.append(m)
                    acc = cx[r, lvl] * x
                    for q, mq in enumerate(ms):
                        acc = acc + b[r, lvl, q] * mq
                    xi = acc.astype(x.dtype)
                cap = ((xi, jnp.full((B,), out_t[r], jnp.float32))
                       if capture else None)
                return xi, cap

            x, cap = jax.lax.scan(body, x, jnp.arange(len(run)))
            if capture:
                xs_cap.append(cap[0])
                ts_cap.append(cap[1])
            eval_idx += k * len(run)
            i = j
        trajectory = None
        if capture:
            # reference save_logs captures post-update states; drop the
            # final one to keep `len == number of updates` semantics aligned
            # with the multistep capture (t2i get_calib_data.py:167-169)
            xs = jnp.concatenate(xs_cap, axis=0)[:-1]
            tss = jnp.concatenate(ts_cap, axis=0)[:-1]
            trajectory = {"xs": xs, "ts": tss}
        return x, trajectory, eval_idx


def dpm_solver_pp_2m(noise_model_fn: Callable, z: jnp.ndarray,
                     steps: int = 20, t_start: float = 1.0,
                     t_end: Optional[float] = None,
                     schedule: Optional[NoiseScheduleVP] = None,
                     capture_trajectory: bool = False):
    """Back-compat wrapper: multistep DPM-Solver++ order 2, time_uniform."""
    ns = schedule or NoiseScheduleVP()
    solver = DPMSolver(noise_model_fn, ns, algorithm_type="dpmsolver++")
    return solver.sample(z, steps=steps, t_start=t_start, t_end=t_end,
                         order=2, skip_type="time_uniform",
                         method="multistep", lower_order_final=True,
                         capture_trajectory=capture_trajectory)


class DPMSolverSampler:
    """Scheduler-registry wrapper (reference DMP_SOLVER dpms/__init__.py:11,
    DPMS_alpha/DPMS_sigma t2i/diffusion/dpm_solver_{alpha,sigma}.py:6-36 —
    identical implementations): CFG over [cond; null] text embeds, variance
    channels chunked off before solving (forward_with_dpmsolver)."""

    def __init__(self, num_sampling_steps: int = 20, cfg_scale: float = 4.0,
                 in_channels: int = 4, cfg_split: bool = False,
                 order: int = 2, method: str = "multistep",
                 skip_type: str = "time_uniform",
                 algorithm_type: str = "dpmsolver++",
                 solver_type: str = "dpmsolver",
                 lower_order_final="auto",
                 thresholding: bool = False,
                 denoise_to_zero: bool = False,
                 model_type: str = "noise"):
        self.steps = num_sampling_steps
        self.cfg_scale = cfg_scale
        self.in_channels = in_channels
        self.cfg_split = cfg_split
        self.order = order
        self.method = method
        self.skip_type = skip_type
        self.algorithm_type = algorithm_type
        self.solver_type = solver_type
        # the two references DISAGREE here: t2i applies lower-order final
        # steps unconditionally (dpm_solver_alpha.py:1236), the t2v solver
        # only when steps < 10 (t2v dpms/dpm_solver.py:1419-1420). "auto"
        # follows the t2v rule — the common multistep case at steps>=10
        # keeps full order on the last updates; pass True/False to force.
        if lower_order_final == "auto":
            lower_order_final = num_sampling_steps < 10
        self.lower_order_final = lower_order_final
        self.thresholding = thresholding
        self.denoise_to_zero = denoise_to_zero
        self.model_type = model_type
        self.ns = NoiseScheduleVP()

    def _eps_from_output(self, out, x, t_model):
        """model_type conversions (model_wrapper noise_pred_fn,
        dpm_solver_alpha.py:284-301)."""
        if self.model_type == "noise":
            return out
        t_cont = t_model[0] / 1000.0 + 1.0 / self.ns.total_N
        nd = x.ndim
        alpha = self.ns.marginal_alpha(t_cont).reshape((1,) * nd)
        sigma = self.ns.marginal_std(t_cont).reshape((1,) * nd)
        if self.model_type == "x_start":
            return (x - alpha * out) / sigma
        if self.model_type == "v":
            return alpha * out + sigma * x
        if self.model_type == "score":
            return -sigma * out
        raise ValueError(f"unsupported model_type {self.model_type!r}")

    def sample(self, model_apply, z, y, mask=None, rng=None,
               qctx_factory=None, return_trajectory: bool = False):
        """z: [n, C, ...]; y: [2n, 1, L, C_cap] = [cond; null]."""
        c = self.in_channels
        s = self.cfg_scale

        def noise_model_fn(x, t_model, step_idx):
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
            eps_c = self._eps_from_output(out_c[:, :c], x, t_model)
            eps_u = self._eps_from_output(out_u[:, :c], x, t_model)
            return eps_u + s * (eps_c - eps_u)

        solver = DPMSolver(
            noise_model_fn, self.ns, algorithm_type=self.algorithm_type,
            solver_type=self.solver_type,
            correcting_x0_fn=("dynamic_thresholding" if self.thresholding
                              else None))
        return solver.sample(z, steps=self.steps, order=self.order,
                             skip_type=self.skip_type, method=self.method,
                             lower_order_final=self.lower_order_final,
                             denoise_to_zero=self.denoise_to_zero,
                             capture_trajectory=return_trajectory)
