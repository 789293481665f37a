"""Training-entry tests: gradient accumulation algebra, full train-state
checkpoint/resume, epoch-structured resumable train_entry (reference
t2v/scripts/train.py: booster save/load + StatefulDistributedSampler
set_start_index, train.py:190-199,243-257)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from viditq_tpu.models import STDiT
from viditq_tpu.parallel.training import make_optimizer, make_train_step
from viditq_tpu.pipelines.train import train_entry, train_loop
from viditq_tpu.samplers import make_schedule
from viditq_tpu.samplers.gaussian_diffusion import training_losses

pytestmark = pytest.mark.heavy

TINY = dict(input_size=(2, 8, 8), in_channels=4, patch_size=(1, 2, 2),
            hidden_size=32, depth=1, num_heads=4, caption_channels=16,
            model_max_length=4, dtype=jnp.float32)
LATENT = (4, 2, 8, 8)
CAP = (1, 4, 16)


def _batch(rng, B):
    r = np.random.default_rng(rng)
    return {"x0": jnp.asarray(r.standard_normal((B,) + LATENT), jnp.float32),
            "t": jnp.asarray(r.integers(0, 10, B)),
            "y": jnp.asarray(r.standard_normal((B,) + CAP), jnp.float32),
            "mask": jnp.ones((B, CAP[-2]), jnp.int32)}


def _init(model, batch):
    variables = model.init(jax.random.PRNGKey(0), batch["x0"],
                           batch["t"].astype(jnp.float32), batch["y"],
                           batch["mask"])
    return variables["params"]


def test_grad_accum_matches_manual_microbatching():
    """grad_accum=2 step == mean of per-microbatch grads (split rngs),
    one optimizer update. SGD so the param delta is linear in the grads
    (adam's eps-normalization amplifies float32 noise between the fused
    scan and the separate microbatch compilations)."""
    model = STDiT(**TINY)
    schedule = make_schedule(num_sampling_steps=10)
    opt = optax.sgd(1e-2)
    batch = _batch(0, 4)
    params = _init(model, batch)
    ema = jax.tree.map(lambda v: v, params)
    opt_state = opt.init(params)
    rng_step = jax.random.PRNGKey(3)

    step = jax.jit(make_train_step(model, schedule, opt, grad_accum=2))
    p_got, _, _, loss_got = step(params, ema, opt_state, batch, rng_step)

    @jax.jit
    def micro_grads(params, mb, mrng):
        noise = jax.random.normal(mrng, mb["x0"].shape, jnp.float32)

        def loss_fn(p):
            def model_fn(x_t, tt):
                return model.apply({"params": p}, x_t, tt, mb["y"],
                                   mb["mask"])
            return jnp.mean(training_losses(model_fn, mb["x0"], mb["t"],
                                            noise, schedule, 4))

        return jax.value_and_grad(loss_fn)(params)

    rngs = jax.random.split(rng_step, 2)
    g_sum = jax.tree.map(jnp.zeros_like, params)
    l_sum = 0.0
    for i in range(2):
        mb = jax.tree.map(lambda v: v[i * 2:(i + 1) * 2], batch)
        l, g = micro_grads(params, mb, rngs[i])
        g_sum = jax.tree.map(jnp.add, g_sum, g)
        l_sum = l_sum + l
    grads = jax.tree.map(lambda g: g / 2, g_sum)
    updates, _ = opt.update(grads, opt_state, params)
    p_want = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_got), float(l_sum / 2), rtol=1e-5)
    for got, want in zip(jax.tree.leaves(p_got), jax.tree.leaves(p_want)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-7)


def test_warmup_first_step_is_identity():
    """linear warmup starts at lr=0: the first update must leave params
    unchanged, training proceeds after."""
    model = STDiT(**TINY)
    schedule = make_schedule(num_sampling_steps=10)
    opt = make_optimizer(lr=1e-3, warmup_steps=5, grad_clip=1.0)
    batch = _batch(1, 2)
    params = _init(model, batch)
    step = jax.jit(make_train_step(model, schedule, opt))
    p1, _, opt_state, _ = step(params, jax.tree.map(lambda v: v, params),
                               opt.init(params), batch, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p2, _, _, _ = step(p1, p1, opt_state, batch, jax.random.PRNGKey(1))
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)))


def test_train_state_checkpoint_resume(tmp_path):
    """4 synthetic steps with a checkpoint at step 2 == 2 steps resumed
    from that checkpoint (params, ema, and optimizer state all restored)."""
    model = STDiT(**TINY)
    kw = dict(latent_shape=LATENT, caption_shape=CAP, lr=1e-3,
              log_every=0, save_dir=str(tmp_path))
    full = train_loop(model, None, num_steps=4, ckpt_every=2, **kw)
    resumed = train_loop(
        model, None, num_steps=4,
        resume_from=str(tmp_path / "train_state_2.msgpack"), **kw)
    assert resumed["meta"]["step"] == 2
    for a, b in zip(jax.tree.leaves(full["params"]),
                    jax.tree.leaves(resumed["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(full["ema"]),
                    jax.tree.leaves(resumed["ema"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


class _DictDataset:
    def __init__(self, n):
        self.items = []
        r = np.random.default_rng(9)
        for _ in range(n):
            self.items.append({
                "x0": r.standard_normal(LATENT).astype(np.float32),
                "t": int(r.integers(0, 1000)),
                "y": r.standard_normal(CAP).astype(np.float32),
                "mask": np.ones((CAP[-2],), np.int32)})

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_train_entry_mid_epoch_resume(tmp_path):
    """train_entry over a map-style dataset: resuming from the mid-epoch
    checkpoint (sampler start_index in the meta) reproduces the
    uninterrupted run exactly."""
    ds = _DictDataset(8)  # n_per_epoch = 4 at batch_size 2
    model = STDiT(**TINY)
    kw = dict(latent_shape=LATENT, caption_shape=CAP, lr=1e-3, log_every=0)
    full = train_entry(model, ds, epochs=1, batch_size=2, ckpt_every=2,
                       save_dir=str(tmp_path / "a"), **kw)
    resumed = train_entry(
        model, ds, epochs=1, batch_size=2,
        resume_from=str(tmp_path / "a" / "train_state_2.msgpack"),
        save_dir=str(tmp_path / "b"), **kw)
    for a, b in zip(jax.tree.leaves(full["params"]),
                    jax.tree.leaves(resumed["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_train_entry_epoch_rollover_resume(tmp_path):
    """A checkpoint written at the last step of epoch 0 resumes into
    epoch 1 (reference: sampler start index reset, train.py:284-286)."""
    ds = _DictDataset(4)  # n_per_epoch = 2
    model = STDiT(**TINY)
    kw = dict(latent_shape=LATENT, caption_shape=CAP, lr=1e-3, log_every=0)
    full = train_entry(model, ds, epochs=2, batch_size=2, ckpt_every=2,
                       save_dir=str(tmp_path / "a"), **kw)
    resumed = train_entry(
        model, ds, epochs=2, batch_size=2,
        resume_from=str(tmp_path / "a" / "train_state_2.msgpack"),
        save_dir=str(tmp_path / "b"), **kw)
    for a, b in zip(jax.tree.leaves(full["params"]),
                    jax.tree.leaves(resumed["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_orbax_train_state_roundtrip(tmp_path):
    """Async orbax save -> wait -> restore == original (sharded-aware
    production checkpoint path)."""
    import optax
    from viditq_tpu.utils.ckpt import (load_train_state_orbax,
                                       save_train_state_orbax,
                                       wait_for_orbax_saves)
    model = STDiT(**TINY)
    batch = _batch(7, 2)
    params = _init(model, batch)
    ema = jax.tree.map(lambda v: v * 0.5, params)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    d = str(tmp_path / "ckpt_1")
    save_train_state_orbax(d, params, ema, opt_state,
                           meta={"step": 3, "epoch": 1})
    wait_for_orbax_saves()
    p2, e2, o2, meta = load_train_state_orbax(d, params, opt.init(params))
    assert meta == {"step": 3, "epoch": 1}
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(e2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_loop_orbax_format_resume(tmp_path):
    """ckpt_format='orbax': directory checkpoints, resume by dir path."""
    model = STDiT(**TINY)
    kw = dict(latent_shape=LATENT, caption_shape=CAP, lr=1e-3,
              log_every=0, save_dir=str(tmp_path))
    full = train_loop(model, None, num_steps=3, ckpt_every=2,
                      ckpt_format="orbax", **kw)
    resumed = train_loop(model, None, num_steps=3,
                         resume_from=str(tmp_path / "train_state_2"), **kw)
    assert resumed["meta"]["step"] == 2
    for a, b in zip(jax.tree.leaves(full["params"]),
                    jax.tree.leaves(resumed["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


class _VideoDataset:
    """Items shaped like raw latents for make_encode_batch (no VAE)."""

    def __init__(self, n):
        r = np.random.default_rng(11)
        self.items = [{"video": r.standard_normal(LATENT).astype(np.float32)}
                      for _ in range(n)]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_train_entry_resume_with_encode_batch(tmp_path):
    """Mid-epoch resume with an rng-folding encode_batch: the step index
    must continue at the resume point so t/rng draws reproduce the
    uninterrupted run (review finding: enumerate restarted at 0)."""
    from viditq_tpu.pipelines.train import make_encode_batch
    ds = _VideoDataset(8)
    model = STDiT(**TINY)
    enc = make_encode_batch(null_caption_shape=CAP, schedule_steps=1000)
    kw = dict(latent_shape=LATENT, caption_shape=CAP, lr=1e-3, log_every=0,
              encode_batch=enc)
    full = train_entry(model, ds, epochs=1, batch_size=2, ckpt_every=2,
                       save_dir=str(tmp_path / "a"), **kw)
    resumed = train_entry(
        model, ds, epochs=1, batch_size=2,
        resume_from=str(tmp_path / "a" / "train_state_2.msgpack"),
        save_dir=str(tmp_path / "b"), **kw)
    for a, b in zip(jax.tree.leaves(full["params"]),
                    jax.tree.leaves(resumed["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
