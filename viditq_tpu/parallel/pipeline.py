"""GPipe-style pipeline parallelism over the DiT block stack.

Beyond the reference (it ships dp + Ulysses sp only,
`t2v/opensora/acceleration/`): the scan_blocks param stack (leading
[depth] axis, models/stdit.py) is the natural pipeline layout on TPU —
shard that axis over a `pp` mesh axis so each device holds depth/S
contiguous blocks, then stream microbatches stage-to-stage with
`jax.lax.ppermute` inside `shard_map` (the scaling-book pipelining
recipe: activations hop one ICI neighbor per tick; tick t runs microbatch
t-s on stage s; M microbatches drain in M + S - 1 ticks with the usual
S-1-tick bubble).

The cheap embed/final parts of the model stay ordinary GSPMD-replicated
code (STDiT `stage='embed'/'final'`); only the block stack — ~95% of the
FLOPs — runs pipelined.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_stacked_over_pp(stacked, mesh: Mesh, axis: str = "pp"):
    """device_put a scan_blocks-stacked pytree (leaves [depth, ...]) with
    its leading axis sharded over the pp mesh axis."""
    return jax.device_put(
        stacked, NamedSharding(mesh, P(axis)))


def pipeline_apply(block_step: Callable, stacked, x_mb, extras_mb,
                   mesh: Mesh, axis: str = "pp"):
    """Run a block stack pipeline-parallel over microbatches.

    block_step(stacked_slice, x, extras) -> x applies ONE block:
    `stacked_slice` is the per-block slice of `stacked` (params / quant
    tables / per-block aux like tpe gates), `extras` the per-microbatch
    context (y, t0, mask, ...).

    stacked:   pytree, leaves [depth, ...], leading axis sharded P(axis)
    x_mb:      [M, mb, ...] microbatched activations (replicated)
    extras_mb: pytree, leaves [M, ...] microbatched context (replicated)

    Returns [M, mb, ...] outputs, replicated. Output deposit uses a
    masked psum off the last stage — fine at inference-activation sizes;
    shard the M axis instead if outputs ever dominate.
    """
    S = mesh.shape[axis]
    M = x_mb.shape[0]

    def stage_fn(stacked_loc, x_mb_, extras_mb_):
        sid = jax.lax.axis_index(axis)

        def run_local(x, extras):
            def body(carry, sl):
                return block_step(sl, carry, extras), None
            out, _ = jax.lax.scan(body, x, stacked_loc)
            return out

        def tick(carry, t):
            buf, outs = carry
            mb_id = t - sid
            idx = jnp.clip(mb_id, 0, M - 1)
            first_in = jax.lax.dynamic_index_in_dim(
                x_mb_, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            inp = jnp.where(sid == 0, first_in, buf)
            extras = jax.tree.map(
                lambda v: jax.lax.dynamic_index_in_dim(v, idx, 0,
                                                       keepdims=False),
                extras_mb_)
            out = run_local(inp, extras)
            active = (mb_id >= 0) & (mb_id < M)
            out = jnp.where(active, out, jnp.zeros_like(out))
            # last stage deposits its finished microbatch
            deposit = jnp.where(
                active & (sid == S - 1), out,
                jax.lax.dynamic_index_in_dim(outs, idx, 0, keepdims=False))
            outs = jax.lax.dynamic_update_index_in_dim(outs, deposit, idx, 0)
            # activations hop to the ICI neighbor (stage s -> s+1); stage 0
            # receives zeros (it reads from x_mb_ instead)
            nbuf = jax.lax.ppermute(out, axis,
                                    [(i, i + 1) for i in range(S - 1)])
            return (nbuf, outs), None

        buf0 = jnp.zeros_like(x_mb_[0])
        outs0 = jnp.zeros_like(x_mb_)
        # scan (not fori_loop) over ticks: reverse-mode differentiable, so
        # jax.grad flows through the pipeline for GPipe-style training
        (_, outs), _ = jax.lax.scan(tick, (buf0, outs0),
                                    jnp.arange(M + S - 1))
        # replicate the last stage's deposit buffer to every device
        return jax.lax.psum(
            jnp.where(sid == S - 1, outs, jnp.zeros_like(outs)), axis)

    fn = shard_map(stage_fn, mesh=mesh,
                   in_specs=(P(axis), P(), P()), out_specs=P(),
                   check_vma=False)
    return fn(stacked, x_mb, extras_mb)


def _microbatch(tree, n_mb: int):
    def split(v):
        B = v.shape[0]
        assert B % n_mb == 0, f"batch {B} not divisible by {n_mb} microbatches"
        return v.reshape((n_mb, B // n_mb) + v.shape[1:])
    return jax.tree.map(split, tree)


def stdit_pipeline_forward(model, variables, x, timestep, y, mask=None,
                           qctx=None, *, mesh: Mesh, n_microbatches: int,
                           axis: str = "pp"):
    """Full STDiT forward with the block stack pipelined over `axis`.

    model must be built with scan_blocks=True (the stacked-params layout).
    Embed and final run replicated via the model's stage entry points;
    the 28-block stack streams n_microbatches CFG samples through the
    pipeline. Equals the single-chip forward exactly (tests).
    """
    from viditq_tpu.models.stdit import STDiTBlock

    if "blocks" not in variables["params"]:
        raise ValueError("pipeline needs scan_blocks=True (stacked "
                         "'blocks' params); rebuild the model with it")
    depth = model.depth
    if depth % mesh.shape[axis] != 0:
        raise ValueError(f"depth {depth} must divide the {axis} axis "
                         f"size {mesh.shape[axis]}")
    xt, t0, y2, mask2, tpe = model.apply(variables, x, timestep, y, mask,
                                         qctx, stage="embed")
    blk = STDiTBlock(model.hidden_size, model.num_heads,
                     d_s=model.num_spatial, d_t=model.num_temporal,
                     mlp_ratio=model.mlp_ratio, resolver=model.resolver,
                     prefix="blocks.0", dtype=model.dtype)

    stacked: Dict[str, Any] = {"params": variables["params"]["blocks"]}
    if "quant" in variables and "blocks" in variables["quant"]:
        stacked["quant"] = variables["quant"]["blocks"]
    # tpe is added by block 0 only (scan gate trick, models/stdit.py)
    stacked["gate"] = jnp.zeros((depth, 1, 1), xt.dtype).at[0].set(1.0)
    stacked = shard_stacked_over_pp(stacked, mesh, axis)

    def block_step(sl, xb, extras):
        bvars = {"params": sl["params"]}
        if "quant" in sl:
            bvars["quant"] = sl["quant"]
        return blk.apply(bvars, xb, extras["y"], extras["t0"],
                         extras.get("mask"), tpe, qctx, sl["gate"])

    x_mb = _microbatch(xt, n_microbatches)
    extras = {"y": y2, "t0": t0}
    if mask2 is not None:
        extras["mask"] = mask2
    extras_mb = _microbatch(extras, n_microbatches)

    out = pipeline_apply(block_step, stacked, x_mb, extras_mb, mesh, axis)
    out = out.reshape((-1,) + out.shape[2:])
    return model.apply(variables, x, timestep, y, mask, qctx,
                       stage="final", x_tokens=out)


def pixart_pipeline_forward(model, variables, x, timestep, y, mask=None,
                            qctx=None, *, mesh: Mesh, n_microbatches: int,
                            data_info=None, axis: str = "pp"):
    """PixArt forward with the block stack pipelined (scan_blocks=True,
    uniform stack only — Σ KV-compress splits the stack into runs with
    different param structures, which a homogeneous pipeline stage can't
    hold; use dp/sp/tp for those configs)."""
    from viditq_tpu.models.pixart import PixArtBlock

    if "blocks" not in variables["params"]:
        raise ValueError(
            "pipeline needs a single uniform scan run ('blocks'); this "
            "model has a non-uniform stack (e.g. Σ KV-compress runs)")
    if getattr(model, "kv_compress_layers", ()) \
            and model.kv_compress_scale > 1:
        # a FULL-stack kv_compress config also yields one run named
        # 'blocks', but its params carry sr-conv weights a plain
        # PixArtBlock would silently ignore
        raise ValueError("pipeline does not support KV-compress stacks")
    if model.depth % mesh.shape[axis] != 0:
        raise ValueError(f"depth {model.depth} must divide the {axis} "
                         f"axis size {mesh.shape[axis]}")
    xt, t0, y2, mask2, hw = model.apply(variables, x, timestep, y, mask,
                                        data_info, qctx, stage="embed")
    blk = PixArtBlock(model.hidden_size, model.num_heads,
                      mlp_ratio=model.mlp_ratio, qk_norm=model.qk_norm,
                      sampling=None, sr_ratio=1, resolver=model.resolver,
                      prefix="blocks.0", dtype=model.dtype)

    stacked: Dict[str, Any] = {"params": variables["params"]["blocks"]}
    if "quant" in variables and "blocks" in variables["quant"]:
        stacked["quant"] = variables["quant"]["blocks"]
    stacked = shard_stacked_over_pp(stacked, mesh, axis)

    def block_step(sl, xb, extras):
        bvars = {"params": sl["params"]}
        if "quant" in sl:
            bvars["quant"] = sl["quant"]
        return blk.apply(bvars, xb, extras["y"], extras["t0"],
                         extras.get("mask"), hw, qctx)

    x_mb = _microbatch(xt, n_microbatches)
    extras = {"y": y2, "t0": t0}
    if mask2 is not None:
        extras["mask"] = mask2
    extras_mb = _microbatch(extras, n_microbatches)

    out = pipeline_apply(block_step, stacked, x_mb, extras_mb, mesh, axis)
    out = out.reshape((-1,) + out.shape[2:])
    return model.apply(variables, x, timestep, y, mask, data_info, qctx,
                       stage="final", x_tokens=out)


def make_pp_train_step(model, schedule, optimizer, *, mesh: Mesh,
                       n_microbatches: int, in_channels: int = 4,
                       ema_decay: float = 0.9999, axis: str = "pp"):
    """GPipe training step: the diffusion MSE loss runs through the
    pipelined forward (differentiable scan tick loop), one optimizer
    update per batch. Same signature as parallel.training.make_train_step's
    plain path. Grads on the block stack stay pp-sharded through the
    backward ppermute transposes; embed/final grads replicate."""
    import optax

    from viditq_tpu.parallel.training import update_ema
    from viditq_tpu.samplers.gaussian_diffusion import training_losses

    def train_step(params, ema, opt_state, batch, rng):
        noise = jax.random.normal(rng, batch["x0"].shape, jnp.float32)

        def loss_fn(p):
            def model_fn(x_t, tt):
                return stdit_pipeline_forward(
                    model, {"params": p}, x_t, tt, batch["y"],
                    batch.get("mask"), mesh=mesh,
                    n_microbatches=n_microbatches, axis=axis)
            losses = training_losses(model_fn, batch["x0"], batch["t"],
                                     noise, schedule, in_channels)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = update_ema(ema, params, ema_decay)
        return params, ema, opt_state, loss

    return train_step
