"""Training loop (reference `t2v/scripts/train.py`): diffusion MSE training
with EMA, dp/sp/tp mesh sharding, periodic checkpointing, resumable
mid-epoch via StatefulSampler."""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from viditq_tpu.parallel.mesh import make_mesh
from viditq_tpu.parallel.training import (
    batch_sharding, make_optimizer, make_train_step, shardings_for_state)
from viditq_tpu.samplers import make_schedule
from viditq_tpu.utils import ckpt as ckpt_utils


def train_loop(model, dataset_iter, *, latent_shape, caption_shape,
               num_steps: int = 100, lr: float = 1e-4,
               ema_decay: float = 0.9999, ckpt_every: int = 0,
               save_dir: str = "outputs/train", mesh=None,
               log_every: int = 10, rng=None,
               resume_params: Optional[Dict] = None):
    """dataset_iter yields {'x0': [B,C,...], 't': [B], 'y': ..., 'mask': ...}
    (or pass None to train on synthetic data for smoke runs)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    schedule = make_schedule(num_sampling_steps=None,
                             timestep_respacing=[1000])

    def synth_batch(i):
        k = jax.random.fold_in(rng, i)
        ks = jax.random.split(k, 4)
        B = 2
        return {
            "x0": jax.random.normal(ks[0], (B,) + tuple(latent_shape)),
            "t": jax.random.randint(ks[1], (B,), 0, schedule.n_steps),
            "y": jax.random.normal(ks[2], (B,) + tuple(caption_shape)),
            "mask": jnp.ones((B, caption_shape[-2]), jnp.int32),
        }

    batch0 = synth_batch(0) if dataset_iter is None else next(dataset_iter)
    variables = model.init(rng, batch0["x0"],
                           batch0["t"].astype(jnp.float32), batch0["y"],
                           batch0.get("mask"))
    params = resume_params or variables["params"]
    ema = jax.tree.map(lambda v: v, params)
    optimizer = make_optimizer(lr=lr)
    opt_state = optimizer.init(params)
    train_step = make_train_step(model, schedule, optimizer,
                                 ema_decay=ema_decay)

    if mesh is not None:
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
    else:
        step_fn = jax.jit(train_step)

    losses = []
    t_start = time.time()
    for i in range(num_steps):
        batch = synth_batch(i) if dataset_iter is None else next(dataset_iter)
        params, ema, opt_state, loss = step_fn(
            params, ema, opt_state, batch, jax.random.fold_in(rng, 10_000 + i))
        if (log_every and (i + 1) % log_every == 0) or i == num_steps - 1:
            losses.append(float(loss))
            print(f"step {i+1}/{num_steps} loss {float(loss):.4f} "
                  f"({(i+1)/(time.time()-t_start):.2f} it/s)")
        if ckpt_every and (i + 1) % ckpt_every == 0:
            os.makedirs(save_dir, exist_ok=True)
            ckpt_utils.save_params(os.path.join(save_dir, f"step_{i+1}.msgpack"),
                                   jax.tree.map(np.asarray, ema))
    return {"params": params, "ema": ema, "losses": losses}
