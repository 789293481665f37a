"""Distributed diffusion training step (DP/ZeRO-style + SP + TP via GSPMD).

Reference: `t2v/scripts/train.py` (ColossalAI ZeRO-2 + Ulysses SP). Here the
whole step is one pjit'd function over a (dp, sp, tp) mesh: batch sharded on
dp, weights sharded by Megatron rules on tp (viditq_tpu.parallel.mesh),
sequence sharding on sp propagated by GSPMD, gradients reduced by XLA
collectives over ICI — no explicit NCCL-style wrappers
(acceleration/communications.py has no analog; psum/all_gather are inserted
by the partitioner).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from viditq_tpu.parallel.mesh import param_sharding_rules
from viditq_tpu.samplers.gaussian_diffusion import Schedule, training_losses


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.0,
                   ema_decay: float = 0.9999, grad_clip: float = 0.0,
                   warmup_steps: int = 0) -> optax.GradientTransformation:
    """HybridAdam-equivalent (train.py:150-156) as optax adamw.

    grad_clip mirrors the reference ZeRO plugin's max_norm
    (train.py:70-75); warmup is linear 0->lr over warmup_steps (the
    reference runs lr_scheduler=None, so 0 disables it)."""
    del ema_decay
    # keep the opt_state STRUCTURE invariant to grad_clip/warmup choices
    # (a checkpoint saved with clipping must restore into a run without,
    # utils/ckpt.load_train_state templates): always chain a clip (inf =
    # no-op) and always use a schedule (constant when no warmup)
    schedule = (optax.linear_schedule(0.0, lr, warmup_steps)
                if warmup_steps else optax.constant_schedule(lr))
    return optax.chain(
        optax.clip_by_global_norm(grad_clip if grad_clip else float("inf")),
        optax.adamw(schedule, weight_decay=weight_decay))


def update_ema(ema_params, params, decay: float = 0.9999):
    """EMA update (reference train_utils.update_ema)."""
    return jax.tree.map(lambda e, p: e * decay + p * (1 - decay),
                        ema_params, params)


def make_train_step(model, schedule: Schedule,
                    optimizer: optax.GradientTransformation,
                    in_channels: int = 4, ema_decay: float = 0.9999,
                    loss_type: str = "mse",
                    schedule_sampler: Optional[str] = None,
                    grad_accum: int = 1):
    """Returns train_step(params, ema, opt_state, batch, rng) ->
    (params, ema, opt_state, loss).

    batch: {'x0': [B, C, ...], 't': [B] int32 spaced-step ids,
            'y': [B, 1, L, C_cap], 'mask': [B, L] | None}.

    loss_type: 'mse' (fast path) | 'rescaled_mse' | 'kl' | 'rescaled_kl'
    (the reference training_losses loss types; non-mse adds the
    variational-bound term training the variance head).
    grad_accum: split the batch into grad_accum microbatches scanned
    inside the jitted step, averaging gradients before one optimizer
    update (B must divide evenly). The reference has no accumulation
    (ZeRO backward per batch); on TPU it trades peak activation memory
    for scan steps without touching semantics.
    schedule_sampler: None/'uniform' keeps the batch's t;
    'loss-second-moment' returns a step with signature
    (params, ema, opt_state, batch, rng, sampler_state) ->
    (params, ema, opt_state, loss, sampler_state) that importance-samples t
    and reweights per-sample losses (reference create_named_schedule_sampler
    + LossSecondMomentResampler, timestep_sampler.py)."""

    def per_sample_loss(p, batch, t, noise):
        def model_fn(x_t, tt):
            return model.apply({"params": p}, x_t, tt, batch["y"],
                               batch.get("mask"))
        if loss_type == "mse" and schedule_sampler is None:
            return training_losses(model_fn, batch["x0"], t, noise,
                                   schedule, in_channels), None
        from viditq_tpu.samplers.diffusion_losses import training_losses_full
        terms = training_losses_full(model_fn, batch["x0"], t, noise,
                                     schedule, loss_type, in_channels)
        return terms["loss"], terms

    if schedule_sampler == "loss-second-moment":
        assert grad_accum == 1, \
            "grad_accum is not supported with loss-second-moment sampling"
        from viditq_tpu.samplers.diffusion_losses import (
            LossSecondMomentResampler)
        resampler = LossSecondMomentResampler(schedule.n_steps)

        def train_step_ls(params, ema, opt_state, batch, rng, sampler_state):
            rng_t, rng_n = jax.random.split(rng)
            t, w = resampler.sample(sampler_state, rng_t,
                                    batch["x0"].shape[0])
            noise = jax.random.normal(rng_n, batch["x0"].shape, jnp.float32)

            def loss_fn(p):
                losses, _ = per_sample_loss(p, batch, t, noise)
                return jnp.mean(w * losses), losses

            (loss, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            sampler_state = resampler.update(
                sampler_state, t, jax.lax.stop_gradient(losses))
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema = update_ema(ema, params, ema_decay)
            return params, ema, opt_state, loss, sampler_state

        train_step_ls.init_sampler_state = resampler.init
        return train_step_ls

    def batch_grads(params, batch, rng):
        noise = jax.random.normal(rng, batch["x0"].shape, jnp.float32)

        def loss_fn(p):
            losses, _ = per_sample_loss(p, batch, batch["t"], noise)
            return jnp.mean(losses)

        return jax.value_and_grad(loss_fn)(params)

    def train_step(params, ema, opt_state, batch, rng):
        if grad_accum == 1:
            loss, grads = batch_grads(params, batch, rng)
        else:
            def split(v):
                assert v.shape[0] % grad_accum == 0, (
                    f"batch {v.shape[0]} not divisible by "
                    f"grad_accum {grad_accum}")
                return v.reshape((grad_accum, v.shape[0] // grad_accum)
                                 + v.shape[1:])

            micro = jax.tree.map(split, batch)
            rngs = jax.random.split(rng, grad_accum)

            def body(carry, inp):
                g_acc, l_acc = carry
                mb, mrng = inp
                l, g = batch_grads(params, mb, mrng)
                return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None

            init = (jax.tree.map(jnp.zeros_like, params),
                    jnp.zeros((), jnp.float32))
            (g_sum, l_sum), _ = jax.lax.scan(body, init, (micro, rngs))
            grads = jax.tree.map(lambda g: g / grad_accum, g_sum)
            loss = l_sum / grad_accum
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = update_ema(ema, params, ema_decay)
        return params, ema, opt_state, loss

    return train_step


def make_qat_step(model, schedule: Schedule,
                  optimizer: optax.GradientTransformation,
                  qctx, in_channels: int = 4, ema_decay: float = 0.9999):
    """Quantization-aware training step (reference CLI `qat` mode,
    config_utils.py:11-178): the forward runs through the fake quantizers,
    gradients flow via the straight-through estimator (round_ste), weights
    update in full precision. `qctx` should use round_mode 'nearest_ste'
    specs (the default act spec) so STE applies.

    Variables beyond 'params' (the calibrated 'quant' tables) are treated as
    frozen constants during QAT.
    """

    def qat_step(params, quant, ema, opt_state, batch, rng):
        noise = jax.random.normal(rng, batch["x0"].shape, jnp.float32)

        def loss_fn(p):
            def model_fn(x_t, t):
                return model.apply({"params": p, "quant": quant}, x_t, t,
                                   batch["y"], batch.get("mask"), qctx)
            return training_losses(model_fn, batch["x0"], batch["t"], noise,
                                   schedule, in_channels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = update_ema(ema, params, ema_decay)
        return params, ema, opt_state, loss

    return qat_step


def shardings_for_state(mesh: Mesh, params, opt_state, zero: bool = True):
    """NamedShardings: params/ema by TP rules; adam moments additionally
    sharded over dp on their first divisible axis (ZeRO-2-style optimizer
    state sharding, plugin.py:14-66)."""
    from flax import traverse_util

    def param_spec(path, v):
        spec = param_sharding_rules("/".join(str(p) for p in path) + "/")
        return spec if len(spec) <= getattr(v, "ndim", 0) else P()

    flat = traverse_util.flatten_dict(params)
    p_shard = traverse_util.unflatten_dict({
        k: NamedSharding(mesh, param_spec(k, v)) for k, v in flat.items()})

    dp = mesh.shape["dp"]

    def zero_spec(v):
        if not zero or not hasattr(v, "ndim") or v.ndim == 0:
            return NamedSharding(mesh, P())
        if v.shape[0] % dp == 0 and v.shape[0] >= dp and dp > 1:
            return NamedSharding(mesh, P("dp"))
        return NamedSharding(mesh, P())

    def opt_shard_leaf(leaf):
        return zero_spec(leaf)

    o_shard = jax.tree.map(opt_shard_leaf, opt_state)
    return p_shard, o_shard


def batch_sharding(mesh: Mesh, batch: Dict):
    def shard(v):
        if v is None or getattr(v, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        spec = [None] * v.ndim
        spec[0] = "dp"
        return NamedSharding(mesh, P(*spec))
    return jax.tree.map(shard, batch)
