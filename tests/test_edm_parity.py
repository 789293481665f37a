"""EDM (Karras Algorithm 2) sampler oracle parity vs the reference
`t2i/diffusion/model/edm_sample.py:edm_sampler` — round-2 VERDICT next #4.

Both loops are driven by the same deterministic pseudo-denoiser
D(x, sigma) = x/(1+sigma^2) + 0.1*sigma*tanh(x) (smooth, contraction —
keeps fp32-vs-fp64 rounding from amplifying). Churn S_churn=0 (the
deterministic default; the reference's randn draw then multiplies a zero
coefficient). The reference runs the loop in float64 with fp32 net
evaluations; ours is an fp32 lax.scan — 1e-4 parity required.
"""

import os

import numpy as np
import pytest

pytestmark = [pytest.mark.heavy, pytest.mark.skipif(
    not os.path.exists("/root/reference/t2i"), reason="reference not mounted")]

SHAPE = (2, 4, 8, 8)
C = 4


class _PseudoNet:
    sigma_min = 0.0
    sigma_max = float("inf")

    def round_sigma(self, s):
        import torch
        return torch.as_tensor(s)

    def __call__(self, x, sigma, class_labels, cfg_scale, **kw):
        import torch
        s = torch.as_tensor(sigma).to(torch.float32).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        d = x / (1 + s ** 2) + 0.1 * s * torch.tanh(x)
        return {"x": d}


@pytest.mark.parametrize("num_steps", [10, 18])
def test_edm_sampler_parity(num_steps):
    import torch
    import jax.numpy as jnp

    from ref_models import load_edm_module
    from viditq_tpu.samplers.extra_solvers import EDMSampler

    mod = load_edm_module()
    rng = np.random.default_rng(4)
    z = rng.standard_normal(SHAPE).astype(np.float32)

    with torch.no_grad():
        want = mod.edm_sampler(_PseudoNet(), torch.tensor(z),
                               num_steps=num_steps).numpy()

    sampler = EDMSampler(num_sampling_steps=num_steps, cfg_scale=3.0,
                         in_channels=C)
    np.testing.assert_allclose(
        sampler.sigmas()[:-1],
        ((80.0 ** (1 / 7.0) + np.arange(num_steps) / (num_steps - 1)
          * (0.002 ** (1 / 7.0) - 80.0 ** (1 / 7.0))) ** 7.0), rtol=1e-12)

    def denoiser(xx, ss, y, mask, qctx):
        s = ss.reshape((-1,) + (1,) * (xx.ndim - 1))
        return xx / (1 + s ** 2) + 0.1 * s * jnp.tanh(xx)

    # our sampler expects z pre-scaled by sigma_max (the reference scales
    # latents internally: x_next = latents * t_steps[0])
    z0 = jnp.asarray(z) * sampler.sigmas()[0]
    got = np.asarray(sampler.sample(denoiser, z0, y=None))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-4, rel
