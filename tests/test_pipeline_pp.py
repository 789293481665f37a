"""Pipeline-parallel block stack tests (parallel/pipeline.py): GPipe-style
microbatch streaming over a pp mesh axis must equal the single-chip
forward exactly — fp and quantized, eager and jitted."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viditq_tpu.models import STDiT
from viditq_tpu.parallel.mesh import make_mesh
from viditq_tpu.parallel.pipeline import stdit_pipeline_forward
from viditq_tpu.quant import (LayerQuantSpec, QuantCtx, QuantSpec,
                              calibrate_weight_tables, resolve_layer_spec)

pytestmark = pytest.mark.heavy

KW = dict(input_size=(4, 16, 16), in_channels=4, patch_size=(1, 2, 2),
          hidden_size=64, depth=8, num_heads=4, caption_channels=32,
          model_max_length=8, dtype=jnp.float32, scan_blocks=True)


def _inputs(B=4):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 4, 4, 16, 16)), jnp.float32)
    t = jnp.asarray([500.0, 100.0, 30.0, 900.0][:B])
    y = jnp.asarray(rng.standard_normal((B, 1, 8, 32)), jnp.float32)
    mask = jnp.ones((B, 8), jnp.int32)
    return x, t, y, mask


def test_pp_forward_matches_single_chip():
    mesh = make_mesh(pp=4, devices=jax.devices()[:4])
    model = STDiT(**KW)
    x, t, y, mask = _inputs()
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    want = model.apply(variables, x, t, y, mask)
    got = stdit_pipeline_forward(model, variables, x, t, y, mask,
                                 mesh=mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pp_forward_jitted_uneven_microbatches():
    """M != S (more microbatches than stages) under jit."""
    mesh = make_mesh(pp=2, devices=jax.devices()[:2])
    model = STDiT(**KW)
    x, t, y, mask = _inputs()
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    want = model.apply(variables, x, t, y, mask)

    @jax.jit
    def run(vs, x):
        return stdit_pipeline_forward(model, vs, x, t, y, mask,
                                      mesh=mesh, n_microbatches=4)

    got = run(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pp_quantized_forward_matches_single_chip():
    """Quantized block stack (weight tables + dynamic acts) through the
    pipeline — quant tables are stacked/sharded exactly like params.

    Two assertions with different tolerances: pp=4 vs pp=1 pipeline is
    structurally identical (same per-block apply) and must agree tightly;
    pp vs the nn.scan single-chip forward reorders float ops (sliced
    block.apply vs scan), and ~1e-6 input noise legitimately flips int8
    rounding LSBs that cascade — so that comparison gets a quant-aware
    norm tolerance (measured rel norm 0.011 — same order as the plan's
    own quant-vs-FP error, i.e. rounding chaos, not a semantic gap; the
    tight pp4-vs-pp1 assert carries the structural correctness)."""
    w8 = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1)
    a8 = QuantSpec(n_bits=8, granularity="token", dynamic=True)
    fp = ("x_embedder", "t_block", "t_embedder", "y_embedder", "final_layer")
    resolver = lambda n: resolve_layer_spec(  # noqa: E731
        n, LayerQuantSpec(weight=w8, act=a8), fp)
    model = STDiT(resolver=resolver, **KW)
    x, t, y, mask = _inputs()
    variables = dict(model.init(jax.random.PRNGKey(0), x, t, y, mask,
                                QuantCtx(mode="fp")))
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolver)
    qctx = QuantCtx(mode="quant", t_id=jnp.asarray(500))
    want = model.apply(variables, x, t, y, mask, qctx)
    mesh4 = make_mesh(pp=4, devices=jax.devices()[:4])
    mesh1 = make_mesh(pp=1, devices=jax.devices()[:1])
    got4 = stdit_pipeline_forward(model, variables, x, t, y, mask, qctx,
                                  mesh=mesh4, n_microbatches=2)
    got1 = stdit_pipeline_forward(model, variables, x, t, y, mask, qctx,
                                  mesh=mesh1, n_microbatches=2)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(got1),
                               rtol=2e-4, atol=2e-4)
    rel = (np.linalg.norm(np.asarray(got4) - np.asarray(want))
           / np.linalg.norm(np.asarray(want)))
    assert rel < 2e-2, rel
    assert float(jnp.max(jnp.abs(got4 - want))) < 0.3


def test_pp_composes_with_unused_axes():
    """pp on the full 8-device mesh (dp=2 x pp=4): unmentioned axes
    replicate."""
    mesh = make_mesh(dp=2, pp=4)
    model = STDiT(**KW)
    x, t, y, mask = _inputs()
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    want = model.apply(variables, x, t, y, mask)
    got = stdit_pipeline_forward(model, variables, x, t, y, mask,
                                 mesh=mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pixart_pp_forward_matches_single_chip():
    from viditq_tpu.models.pixart import PixArt
    from viditq_tpu.parallel.pipeline import pixart_pipeline_forward
    mesh = make_mesh(pp=4, devices=jax.devices()[:4])
    model = PixArt(input_size=16, depth=8, hidden_size=64, patch_size=2,
                   num_heads=4, caption_channels=32, model_max_length=8,
                   dtype=jnp.float32, scan_blocks=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 4, 16, 16)), jnp.float32)
    t = jnp.asarray([500.0, 100.0, 30.0, 900.0])
    y = jnp.asarray(rng.standard_normal((4, 1, 8, 32)), jnp.float32)
    mask = jnp.ones((4, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    want = model.apply(variables, x, t, y, mask)
    got = pixart_pipeline_forward(model, variables, x, t, y, mask,
                                  mesh=mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pp_gradients_match_single_chip():
    """jax.grad flows through the pipeline (GPipe training): param grads
    of the pipelined forward equal the single-chip grads."""
    mesh = make_mesh(pp=2, devices=jax.devices()[:2])
    model = STDiT(**KW)
    x, t, y, mask = _inputs()
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask)

    def loss_pp(vs):
        out = stdit_pipeline_forward(model, vs, x, t, y, mask,
                                     mesh=mesh, n_microbatches=2)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(vs):
        out = model.apply(vs, x, t, y, mask)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(variables)
    g_ref = jax.jit(jax.grad(loss_ref))(variables)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_pp_train_step_matches_plain():
    """One GPipe train step == one plain train step (SGD, fixed rng)."""
    import optax
    from viditq_tpu.parallel.pipeline import make_pp_train_step
    from viditq_tpu.parallel.training import make_train_step
    from viditq_tpu.samplers import make_schedule
    mesh = make_mesh(pp=2, devices=jax.devices()[:2])
    model = STDiT(**KW)
    schedule = make_schedule(num_sampling_steps=10)
    opt = optax.sgd(1e-2)
    x, t, y, mask = _inputs()
    batch = {"x0": x, "t": jnp.asarray([1, 5, 3, 7]), "y": y, "mask": mask}
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    params = variables["params"]
    ema = jax.tree.map(lambda v: v, params)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(4)

    pp_step = jax.jit(make_pp_train_step(model, schedule, opt, mesh=mesh,
                                         n_microbatches=2))
    plain_step = jax.jit(make_train_step(model, schedule, opt))
    p1, _, _, l1 = pp_step(params, ema, opt_state, batch, rng)
    p2, _, _, l2 = plain_step(params, ema, opt_state, batch, rng)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
