"""VB/KL likelihood terms + loss-aware timestep samplers: oracle parity vs
the reference's own diffusion_utils / timestep_sampler (imported read-only)
and integration with the train step."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

REF_UTILS = "/root/reference/t2v/opensora/schedulers/iddpm/diffusion_utils.py"


def load_ref(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.exists(REF_UTILS),
                    reason="reference not mounted")
def test_likelihoods_match_reference():
    import torch
    from viditq_tpu.samplers.diffusion_losses import (
        discretized_gaussian_log_likelihood, normal_kl)
    ref = load_ref(REF_UTILS, "ref_diffusion_utils")
    rng = np.random.default_rng(0)
    m1, m2 = rng.standard_normal((2, 4, 8)).astype(np.float32)
    lv1, lv2 = rng.standard_normal((2, 4, 8)).astype(np.float32)
    want = ref.normal_kl(torch.tensor(m1), torch.tensor(lv1),
                         torch.tensor(m2), torch.tensor(lv2)).numpy()
    got = np.asarray(normal_kl(jnp.asarray(m1), jnp.asarray(lv1),
                               jnp.asarray(m2), jnp.asarray(lv2)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    x = np.clip(rng.standard_normal((4, 8)).astype(np.float32), -1, 1)
    means = 0.1 * rng.standard_normal((4, 8)).astype(np.float32)
    ls = -2.0 + 0.1 * rng.standard_normal((4, 8)).astype(np.float32)
    want = ref.discretized_gaussian_log_likelihood(
        torch.tensor(x), means=torch.tensor(means),
        log_scales=torch.tensor(ls)).numpy()
    got = np.asarray(discretized_gaussian_log_likelihood(
        jnp.asarray(x), means=jnp.asarray(means), log_scales=jnp.asarray(ls)))
    # log of clamped cdf deltas amplifies fp32 noise near the tails
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-4)


def test_vb_loss_types_and_variance_gradients():
    """vb term trains the variance head: grads flow into the sigma channels
    only through vb for 'rescaled_mse' (mean frozen, reference
    training_losses detach)."""
    from viditq_tpu.samplers import make_schedule
    from viditq_tpu.samplers.diffusion_losses import training_losses_full
    sched = make_schedule(num_sampling_steps=10)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([3, 7])
    W = jnp.asarray(rng.standard_normal((8, 8)) * 0.1, jnp.float32)

    def model_fn_of(w):
        def model_fn(x_t, tt):
            eps = x_t * 0.1
            var = jnp.tanh(x_t @ w)  # trainable variance head
            return jnp.concatenate([eps, var], axis=1)
        return model_fn

    for lt in ("mse", "rescaled_mse", "kl", "rescaled_kl"):
        terms = training_losses_full(model_fn_of(W), x0, t, noise, sched, lt)
        assert terms["loss"].shape == (2,)
        assert np.isfinite(np.asarray(terms["loss"])).all(), lt

    g = jax.grad(lambda w: jnp.mean(training_losses_full(
        model_fn_of(w), x0, t, noise, sched, "rescaled_mse")["loss"]))(W)
    assert float(jnp.abs(g).sum()) > 0  # variance head receives gradient


REF_TS = "/root/reference/t2v/opensora/schedulers/iddpm/timestep_sampler.py"


@pytest.mark.skipif(not os.path.exists(REF_TS),
                    reason="reference not mounted")
def test_loss_second_moment_matches_reference():
    """Ring-buffer semantics + weights match the reference resampler on an
    identical (t, loss) stream."""
    from viditq_tpu.samplers.diffusion_losses import LossSecondMomentResampler
    ref_mod = load_ref(REF_TS, "ref_timestep_sampler")

    class FakeDiffusion:
        num_timesteps = 6

    np.int = int  # the reference uses the removed numpy alias
    try:
        ref = ref_mod.LossSecondMomentResampler(FakeDiffusion(),
                                                history_per_term=3)
    finally:
        del np.int
    ours = LossSecondMomentResampler(6, history_per_term=3)
    state = ours.init()
    rng = np.random.default_rng(0)
    for _ in range(12):
        ts = rng.integers(0, 6, size=4)
        losses = rng.random(4).astype(np.float32)
        ref.update_with_all_losses(list(ts), list(losses))
        state = ours.update(state, ts, losses)
    np.testing.assert_allclose(np.asarray(ours.weights(state)),
                               ref.weights(), rtol=1e-5, atol=1e-6)
    assert bool(np.all(np.asarray(state.counts) == 3)) == ref._warmed_up()
    # unbiased weights: E[w] = 1
    t, w = ours.sample(state, jax.random.PRNGKey(0), 4096)
    assert abs(float(jnp.mean(w)) - 1.0) < 0.15


def test_train_step_with_loss_aware_sampler():
    from viditq_tpu.models import STDiT
    from viditq_tpu.parallel.training import make_optimizer, make_train_step
    from viditq_tpu.samplers import make_schedule
    model = STDiT(input_size=(2, 8, 8), in_channels=4, patch_size=(1, 2, 2),
                  hidden_size=32, depth=1, num_heads=4, caption_channels=16,
                  model_max_length=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 2, 8, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 1, 4, 16)), jnp.float32)
    batch = {"x0": x0, "t": jnp.asarray([1, 2]), "y": y,
             "mask": jnp.ones((2, 4), jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), x0,
                           jnp.zeros((2,), jnp.float32), y, batch["mask"])
    sched = make_schedule(num_sampling_steps=8)
    opt = make_optimizer()
    step = make_train_step(model, sched, opt, loss_type="rescaled_mse",
                           schedule_sampler="loss-second-moment")
    params = variables["params"]
    opt_state = opt.init(params)
    sstate = step.init_sampler_state()
    params, ema, opt_state, loss, sstate = jax.jit(step)(
        params, params, opt_state, batch, jax.random.PRNGKey(1), sstate)
    assert np.isfinite(float(loss))
    assert int(np.asarray(sstate.counts).sum()) == 2
