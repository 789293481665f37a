"""Training entry (reference `t2v/scripts/train.py`): diffusion MSE training
with EMA, dp/sp/tp mesh sharding, gradient accumulation + clipping, LR
warmup, full-state checkpointing, and mid-epoch resume via StatefulSampler.

Layout mirrors the reference entry: `train_loop` is the inner step driver
(booster.boost'd loop body, train.py:185-276); `train_entry` is the
epoch-structured outer loop with the resumable dataloader and on-the-fly
VAE/text encoding (train.py:200-232: vae.encode + text_encoder.encode run
inside the loop under no_grad)."""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from viditq_tpu.parallel.training import (
    batch_sharding, make_optimizer, make_train_step, shardings_for_state)
from viditq_tpu.samplers import make_schedule
from viditq_tpu.utils import ckpt as ckpt_utils


def _log_jsonl(save_dir: str, rec: Dict):
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "train_log.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


def train_loop(model, dataset_iter, *, latent_shape, caption_shape,
               num_steps: int = 100, lr: float = 1e-4,
               ema_decay: float = 0.9999, ckpt_every: int = 0,
               save_dir: str = "outputs/train", mesh=None,
               log_every: int = 10, rng=None,
               resume_params: Optional[Dict] = None,
               resume_ema: Optional[Dict] = None,
               resume_opt_state=None,
               resume_from: Optional[str] = None,
               use_meta_counters: bool = True,
               grad_accum: int = 1, grad_clip: float = 0.0,
               warmup_steps: int = 0, loss_type: str = "mse",
               ckpt_format: str = "msgpack",
               start_step: int = 0, epoch: int = 0,
               sampler=None, consumed_items: int = 0,
               step_cache: Optional[Dict] = None,
               on_step_end: Optional[Callable[[int], None]] = None):
    """dataset_iter yields {'x0': [B,C,...], 't': [B], 'y': ..., 'mask': ...}
    (or pass None to train on synthetic data for smoke runs). The first
    yielded batch is both the init template and the first trained batch.

    resume_from: path to a save_train_state checkpoint — restores params,
    ema, optimizer state, and (if use_meta_counters) the epoch/step
    counters from its meta. Checkpoints written every ckpt_every steps
    carry {'epoch', 'step', 'sampler'} meta so train_entry can resume
    mid-epoch (reference ckpt_utils load/save + set_start_index,
    train.py:190-199). consumed_items: dataset items already drawn from
    `sampler` before this call (for the sampler meta)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    schedule = make_schedule(num_sampling_steps=None,
                             timestep_respacing=[1000])

    def synth_batch(i):
        k = jax.random.fold_in(rng, i)
        ks = jax.random.split(k, 4)
        B = 2 * grad_accum
        return {
            "x0": jax.random.normal(ks[0], (B,) + tuple(latent_shape)),
            "t": jax.random.randint(ks[1], (B,), 0, schedule.n_steps),
            "y": jax.random.normal(ks[2], (B,) + tuple(caption_shape)),
            "mask": jnp.ones((B, caption_shape[-2]), jnp.int32),
        }

    batch0 = synth_batch(0) if dataset_iter is None else next(dataset_iter)
    items_per_step = int(batch0["x0"].shape[0])
    if resume_params is not None:
        params = resume_params  # template exists: skip the init forward
    else:
        params = model.init(rng, batch0["x0"],
                            batch0["t"].astype(jnp.float32), batch0["y"],
                            batch0.get("mask"))["params"]
    optimizer = make_optimizer(lr=lr, grad_clip=grad_clip,
                               warmup_steps=warmup_steps)
    opt_state = (resume_opt_state if resume_opt_state is not None
                 else optimizer.init(params))
    ema = (resume_ema if resume_ema is not None
           else jax.tree.map(lambda v: v, params))
    meta = {}
    if resume_from:
        loader = (ckpt_utils.load_train_state_orbax
                  if os.path.isdir(resume_from)
                  else ckpt_utils.load_train_state)
        params, ema, opt_state, meta = loader(resume_from, params, opt_state)
        if use_meta_counters:
            start_step = int(meta.get("step", start_step))
            epoch = int(meta.get("epoch", epoch))
    train_step = make_train_step(model, schedule, optimizer,
                                 ema_decay=ema_decay, loss_type=loss_type,
                                 grad_accum=grad_accum)

    if step_cache is not None and "step_fn" in step_cache:
        # epoch 2+: reuse the jitted step (avoids a recompile per epoch)
        step_fn = step_cache["step_fn"]
        if mesh is not None:
            p_shard, o_shard = step_cache["shardings"]
            params = jax.device_put(params, p_shard)
            ema = jax.device_put(ema, p_shard)
            opt_state = jax.device_put(opt_state, o_shard)
    elif mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        p_shard, o_shard = shardings_for_state(mesh, params, opt_state)
        params = jax.device_put(params, p_shard)
        ema = jax.device_put(ema, p_shard)
        opt_state = jax.device_put(opt_state, o_shard)
        step_fn = jax.jit(train_step,
                          in_shardings=(p_shard, p_shard, o_shard,
                                        batch_sharding(mesh, batch0),
                                        NamedSharding(mesh, P())),
                          out_shardings=(p_shard, p_shard, o_shard,
                                         NamedSharding(mesh, P())))
        if step_cache is not None:
            step_cache["step_fn"] = step_fn
            step_cache["shardings"] = (p_shard, o_shard)
    else:
        step_fn = jax.jit(train_step)
        if step_cache is not None:
            step_cache["step_fn"] = step_fn
            step_cache["shardings"] = None

    losses = []
    running_loss = jnp.zeros(())  # device scalar: no per-step host sync
    log_count = 0
    t_start = time.time()
    # a real iterator is already positioned at the resume point, so its
    # first batch (pulled above for init shapes) is also the first trained
    # batch; synthetic batches are regenerated per step index instead
    first = batch0 if dataset_iter is not None else None
    for i in range(start_step, num_steps):
        if first is not None:
            batch, first = first, None
        else:
            batch = (synth_batch(i) if dataset_iter is None
                     else next(dataset_iter))
        params, ema, opt_state, loss = step_fn(
            params, ema, opt_state, batch, jax.random.fold_in(rng, 10_000 + i))
        running_loss = running_loss + loss
        log_count += 1
        if (log_every and (i + 1) % log_every == 0) or i == num_steps - 1:
            avg = float(running_loss) / max(log_count, 1)
            losses.append(avg)
            _log_jsonl(save_dir, {"step": i + 1, "epoch": epoch,
                                  "loss": float(loss), "avg_loss": avg,
                                  "it_per_s": (i + 1 - start_step)
                                  / max(time.time() - t_start, 1e-9)})
            print(f"step {i+1}/{num_steps} loss {float(loss):.4f} "
                  f"avg {avg:.4f} "
                  f"({(i+1-start_step)/(time.time()-t_start):.2f} it/s)")
            running_loss, log_count = jnp.zeros(()), 0
        if ckpt_every and (i + 1) % ckpt_every == 0:
            os.makedirs(save_dir, exist_ok=True)
            global_step = epoch * num_steps + i + 1
            smeta = {"epoch": epoch, "step": i + 1,
                     "global_step": global_step}
            if sampler is not None:
                smeta["sampler"] = sampler.state_dict(
                    consumed_items + (i + 1 - start_step) * items_per_step)
            if ckpt_format == "orbax":
                # async: the write overlaps subsequent steps
                ckpt_utils.save_train_state_orbax(
                    os.path.join(save_dir, f"train_state_{global_step}"),
                    params, ema, opt_state, smeta)
            else:
                ckpt_utils.save_train_state(
                    os.path.join(save_dir,
                                 f"train_state_{global_step}.msgpack"),
                    params, ema, opt_state, smeta)
        if on_step_end is not None:
            on_step_end(i)
    if ckpt_every and ckpt_format == "orbax":
        ckpt_utils.wait_for_orbax_saves()
    return {"params": params, "ema": ema, "opt_state": opt_state,
            "losses": losses, "meta": meta}


def make_encode_batch(vae=None, vae_vars=None, text_encoder=None,
                      schedule_steps: int = 1000, rng=None,
                      null_caption_shape=None):
    """Raw {'video','text'} batches -> train batches: VAE-encode pixels to
    latents and text-encode captions inside the loop (reference
    train.py:218-224 under no_grad). Returns encode(batch, step) -> dict.

    text_encoder: a T5Encoder/ClipEncoder/ClassEncoder-style object with
    .encode(prompts) -> {'y': ..., 'mask': ...} (models/text_encoder.py).
    null_caption_shape ([1, L, C]): with no text encoder and no 'y' in the
    batch, feed zero embeds of this shape (smoke runs without T5 weights)."""
    rng = rng if rng is not None else jax.random.PRNGKey(7)
    enc_v = (jax.jit(lambda x: vae.apply(vae_vars, x, method=vae.encode))
             if vae is not None else None)

    def encode(batch, step: int):
        x = jnp.asarray(batch["video"])
        if enc_v is not None:
            x = enc_v(x)
        if text_encoder is not None:
            enc = text_encoder.encode(batch["text"])
            y, mask = enc["y"], enc.get("mask")
        else:
            y, mask = batch.get("y"), batch.get("mask")
            if y is None and null_caption_shape is not None:
                y = jnp.zeros((x.shape[0],) + tuple(null_caption_shape),
                              x.dtype)
                mask = jnp.ones((x.shape[0], null_caption_shape[-2]),
                                jnp.int32)
        k = jax.random.fold_in(rng, step)
        t = jax.random.randint(k, (x.shape[0],), 0, schedule_steps)
        out = {"x0": x, "t": t, "y": y}
        if mask is not None:
            out["mask"] = mask
        return out

    return encode


def train_entry(model, dataset, *, latent_shape, caption_shape,
                epochs: int = 1, batch_size: int = 2,
                encode_batch: Optional[Callable] = None,
                resume_from: Optional[str] = None,
                sampler_seed: int = 0, shuffle: bool = True,
                rank: int = 0, world: int = 1, **loop_kw):
    """Epoch-structured training over a map-style dataset with the
    resumable StatefulSampler (reference train.py:178-286: set_epoch /
    set_start_index, mid-epoch resume from the booster checkpoint).

    encode_batch(raw_batch, step) maps dataset items to train batches
    (see make_encode_batch); None passes items through unchanged.
    loop_kw forwards to train_loop (lr, grad_accum, ckpt_every, mesh...).
    """
    from viditq_tpu.data.datasets import StatefulSampler, batch_iterator

    sampler = StatefulSampler(len(dataset), shuffle=shuffle,
                              seed=sampler_seed, rank=rank, world=world)
    n_per_epoch = len(dataset) // world // batch_size
    start_epoch, start_step, consumed = 0, 0, 0
    if resume_from and os.path.exists(resume_from + ".meta.json"):
        with open(resume_from + ".meta.json") as f:
            meta = json.load(f)
        start_epoch = int(meta.get("epoch", 0))
        start_step = int(meta.get("step", 0))
        if "sampler" in meta:
            sampler.load_state_dict(meta["sampler"])
            consumed = int(meta["sampler"].get("start_index", 0))
        if start_step >= n_per_epoch:  # checkpoint closed out its epoch
            start_epoch, start_step, consumed = start_epoch + 1, 0, 0
            sampler.set_start_index(0)

    out = None
    cache: Dict = {}
    for epoch in range(start_epoch, epochs):
        sampler.set_epoch(epoch)
        epoch_start = start_step

        def batches():
            # start the encode step index at the RESUME point so fold_in
            # reproduces the uninterrupted run's t/rng draws
            for step, raw in enumerate(
                    batch_iterator(dataset, sampler, batch_size),
                    start=epoch_start):
                yield (encode_batch(raw, epoch * n_per_epoch + step)
                       if encode_batch is not None else raw)

        out = train_loop(model, batches(), latent_shape=latent_shape,
                         caption_shape=caption_shape,
                         num_steps=n_per_epoch, start_step=start_step,
                         epoch=epoch, sampler=sampler,
                         consumed_items=consumed, step_cache=cache,
                         resume_from=resume_from if epoch == start_epoch
                         else None, use_meta_counters=False, **loop_kw)
        # later epochs start clean (reference train.py:284-286) but chain
        # the model/ema/optimizer state
        resume_from, start_step, consumed = None, 0, 0
        sampler.set_start_index(0)
        loop_kw["resume_params"] = out["params"]
        loop_kw["resume_ema"] = out["ema"]
        loop_kw["resume_opt_state"] = out["opt_state"]
    return out
