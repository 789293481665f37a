"""AdaRound-style PTQ reconstruction (layer-output optimization).

Reference: `qdiff/optimization/{layer_recon,block_recon,model_recon}.py` +
`LossFunction`/`LinearTempDecay` (`qdiff/utils.py:94-200`) — live in the t2i
flow (`t2i/scripts/ptq.py:320-395`). The optimization minimizes

    || act_q(x) @ soft_quant(w) + b  -  y_fp ||^2
  + lambda * sum(1 - |2*h(alpha) - 1|^b)          (after warmup; b: 10 -> 2)

over the AdaRound logits `alpha` (and optionally the act step size), as a
jitted optax loop with minibatches drawn from captured layer I/O — no hooks,
no module mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from viditq_tpu.quant import core
from viditq_tpu.quant.calibrate import path_to_dotted
from viditq_tpu.quant.naming import pattern_in
from viditq_tpu.quant.spec import LayerQuantSpec


def temp_decay(t, t_max: int, warmup: float = 0.0, start_b: float = 10.0,
               end_b: float = 2.0):
    """LinearTempDecay (qdiff/utils.py:187-200)."""
    start = warmup * t_max
    rel = jnp.clip((t - start) / jnp.maximum(t_max - start, 1), 0.0, 1.0)
    return end_b + (start_b - end_b) * jnp.maximum(0.0, 1.0 - rel)


@dataclasses.dataclass
class ReconConfig:
    iters: int = 2000
    batch_size: int = 32
    lr_alpha: float = 1e-3       # AdaRound logits
    lr_delta: float = 4e-5       # act step size (when opt_target includes act)
    lambda_coeff: float = 1.0    # round-loss weight (utils.py:101)
    b_range: Tuple[float, float] = (10.0, 2.0)
    warmup: float = 0.0
    opt_target: str = "weight"   # 'weight' | 'weight_and_activation'


def layer_reconstruction(kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
                         x_fp: jnp.ndarray, y_fp: jnp.ndarray,
                         lspec: LayerQuantSpec,
                         cfg: ReconConfig = ReconConfig(),
                         rng: Optional[jnp.ndarray] = None
                         ) -> Dict[str, jnp.ndarray]:
    """Optimize AdaRound alpha (+ optionally act delta) for one layer.

    kernel [C_in, F]; x_fp [..., C_in] captured inputs; y_fp matching FP
    outputs. Returns {'w_alpha', 'w_delta', 'w_zp', ['a_delta']}.
    """
    wspec = lspec.weight
    aspec = lspec.act
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    kernel = kernel.astype(jnp.float32)
    x2 = x_fp.reshape(-1, x_fp.shape[-1]).astype(jnp.float32)
    y2 = y_fp.reshape(-1, y_fp.shape[-1]).astype(jnp.float32)
    n = x2.shape[0]
    bs = min(cfg.batch_size, n)

    w_delta, w_zp = core.compute_qparams(kernel, wspec)
    alpha0 = core.adaround_init_alpha(kernel, w_delta)
    opt_act = (cfg.opt_target == "weight_and_activation"
               and aspec is not None and not aspec.dynamic)
    params = {"alpha": alpha0}
    lrs = {"alpha": cfg.lr_alpha}
    a_zp0 = None
    a_opt_spec = aspec
    if opt_act:
        if aspec.granularity == "token":
            # a learned per-token delta over ALL captured rows cannot be
            # indexed per minibatch (shapes differ); learn a shared
            # per-tensor step size instead (the reference's act-delta
            # optimization learns one delta per quantizer too)
            a_opt_spec = dataclasses.replace(aspec, granularity="tensor")
        a_delta0, a_zp0 = core.compute_qparams(x2[None], a_opt_spec)
        params["a_delta"] = a_delta0
        lrs["a_delta"] = cfg.lr_delta

    tx = optax.multi_transform(
        {k: optax.adam(lr) for k, lr in lrs.items()},
        {k: k for k in params})
    opt_state = tx.init(params)
    n_levels = wspec.n_levels()

    def quant_w_soft(alpha):
        floor = jnp.floor(kernel / w_delta)
        soft = core.adaround_soft_targets(alpha)
        if wspec.sym:
            # signed sym codes clamp to [-2^(b-1), 2^(b-1)-1]
            # (core.fake_quant sym branch) — the asym [0, n_levels-1]
            # clamp would zero every negative weight
            code = jnp.clip(floor + soft, -n_levels - 1, n_levels)
            return code * w_delta
        code = jnp.clip(floor + soft + w_zp, 0, n_levels - 1)
        return (code - w_zp) * w_delta

    def act_q(x, p):
        if aspec is None or not lspec.act_quant:
            return x
        if aspec.dynamic:
            return core.fake_quant_dynamic(x[None], aspec)[0]
        if opt_act:
            # learnable step size, zero point fixed at its init value
            return core.fake_quant(x[None], p["a_delta"], a_zp0,
                                   a_opt_spec)[0]
        d, z = core.compute_qparams(x[None], aspec)
        return core.fake_quant(x[None], d, z, aspec)[0]

    def loss_fn(p, xb, yb, t):
        pred = act_q(xb, p) @ quant_w_soft(p["alpha"])
        if bias is not None:
            pred = pred + bias.astype(jnp.float32)
        rec = jnp.mean((pred - yb) ** 2)
        b = temp_decay(t, cfg.iters, cfg.warmup, *cfg.b_range)
        soft = core.adaround_soft_targets(p["alpha"])
        round_loss = cfg.lambda_coeff * jnp.sum(
            1.0 - jnp.abs(2.0 * soft - 1.0) ** b)
        round_loss = jnp.where(t < cfg.warmup * cfg.iters, 0.0, round_loss)
        return rec + round_loss

    @jax.jit
    def step(carry, t):
        p, opt_state, key = carry
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (bs,), 0, n)
        xb, yb = x2[idx], y2[idx]
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb, t)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return (p, opt_state, key), loss

    (params, _, _), losses = jax.lax.scan(
        step, (params, opt_state, rng), jnp.arange(cfg.iters))
    out = {"w_alpha": params["alpha"], "w_delta": w_delta, "w_zp": w_zp,
           "recon_losses": losses}
    if opt_act:
        out["a_delta"] = params["a_delta"]
    return out


def model_reconstruction(variables: Dict, layer_io: Dict[str, Tuple],
                         resolve: Callable[[str], Optional[LayerQuantSpec]],
                         cfg: ReconConfig = ReconConfig(),
                         skip_patterns: Tuple[str, ...] = ("kv_linear",),
                         rng: Optional[jnp.ndarray] = None) -> Dict:
    """Run reconstruction over every captured layer and write the optimized
    alpha/tables into the 'quant' collection.

    layer_io: {dotted_name: (x_fp, y_fp)} from capture (mode='fp',
    capture=True). Layers matching `skip_patterns` are skipped (reference
    model_recon.py:38-52 skips fp layers and kv_linear).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    flat_q = traverse_util.flatten_dict(variables["quant"])
    flat_p = traverse_util.flatten_dict(variables["params"])
    by_name = {}
    for path in flat_q:
        by_name[path_to_dotted(path[:-1])] = path[:-1]
    for i, (name, (x_fp, y_fp)) in enumerate(sorted(layer_io.items())):
        lspec = resolve(name)
        if (lspec is None or lspec.weight is None or not lspec.weight_quant
                or lspec.weight.round_mode != "learned_hard_sigmoid"):
            continue
        if any(pattern_in(name, p) for p in skip_patterns):
            continue
        layer_path = by_name.get(name)
        if layer_path is None:
            continue
        kernel = flat_p[layer_path + ("kernel",)]
        bias = flat_p.get(layer_path + ("bias",))
        if lspec.smooth_quant.enable:
            # CB layers quantize the FOLDED weight w*cs (and rescale acts
            # by 1/cs): learn the rounding on that grid — alphas learned on
            # the raw kernel would pick floor/ceil against a different
            # lattice than the one native packing rounds on
            # (native_pack._round_codes uses w_eff = w*cs(tr)). Timerange 0
            # is the runtime weight-table range (frozen_tr0_weights).
            cs = flat_q.get(layer_path + ("cb_scale",))
            if cs is not None:
                cs0 = jnp.where(cs[0] > 0, cs[0], 1.0).astype(jnp.float32)
                kernel = kernel.astype(jnp.float32) * cs0[:, None]
                x_fp = x_fp.astype(jnp.float32) / cs0
        res = layer_reconstruction(kernel, bias, x_fp, y_fp, lspec, cfg,
                                   jax.random.fold_in(rng, i))
        flat_q[layer_path + ("w_alpha",)] = res["w_alpha"]
        flat_q[layer_path + ("w_delta",)] = (
            flat_q[layer_path + ("w_delta",)]
            .at[lspec.weight.bit_idx, 0].set(res["w_delta"]))
        flat_q[layer_path + ("w_zp",)] = (
            flat_q[layer_path + ("w_zp",)]
            .at[lspec.weight.bit_idx, 0].set(res["w_zp"]))
    variables = dict(variables)
    variables["quant"] = traverse_util.unflatten_dict(flat_q)
    return variables


def mlp_block_reconstruction(fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
                             x_fp: jnp.ndarray, y_fp: jnp.ndarray,
                             lspec: LayerQuantSpec,
                             cfg: ReconConfig = ReconConfig(),
                             rng: Optional[jnp.ndarray] = None) -> Dict:
    """Block-granularity AdaRound: jointly optimize both MLP linears'
    rounding against the block output through the gelu nonlinearity
    (reference block_reconstruction, qdiff/optimization/block_recon.py:31 —
    the block round-loss sums over every QuantLayer in the block,
    qdiff/utils.py:169-176).

    x_fp: captured fc1 inputs; y_fp: captured fc2 FP outputs.
    Returns {'fc1': {...tables...}, 'fc2': {...}}.
    """
    import flax.linen as nn_  # noqa: F401  (gelu via jax.nn below)
    wspec = lspec.weight
    aspec = lspec.act
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x2 = x_fp.reshape(-1, x_fp.shape[-1]).astype(jnp.float32)
    y2 = y_fp.reshape(-1, y_fp.shape[-1]).astype(jnp.float32)
    n = x2.shape[0]
    bs = min(cfg.batch_size, n)

    layers = {}
    for name, k in (("fc1", fc1_kernel), ("fc2", fc2_kernel)):
        k = k.astype(jnp.float32)
        d, z = core.compute_qparams(k, wspec)
        layers[name] = {"kernel": k, "delta": d, "zp": z,
                        "alpha0": core.adaround_init_alpha(k, d)}
    params = {name: layers[name]["alpha0"] for name in layers}
    tx = optax.adam(cfg.lr_alpha)
    opt_state = tx.init(params)
    n_levels = wspec.n_levels()

    def qw(name, alpha):
        L = layers[name]
        floor = jnp.floor(L["kernel"] / L["delta"])
        soft = core.adaround_soft_targets(alpha)
        if wspec.sym:
            code = jnp.clip(floor + soft, -n_levels - 1, n_levels)
            return code * L["delta"]
        code = jnp.clip(floor + soft + L["zp"], 0, n_levels - 1)
        return (code - L["zp"]) * L["delta"]

    def act_q(x):
        if aspec is not None and lspec.act_quant and aspec.dynamic:
            return core.fake_quant_dynamic(x[None], aspec)[0]
        return x

    def fwd(p, xb):
        h = act_q(xb) @ qw("fc1", p["fc1"])
        if fc1_bias is not None:
            h = h + fc1_bias.astype(jnp.float32)
        h = jax.nn.gelu(h, approximate=True)
        out = act_q(h) @ qw("fc2", p["fc2"])
        if fc2_bias is not None:
            out = out + fc2_bias.astype(jnp.float32)
        return out

    def loss_fn(p, xb, yb, t):
        rec = jnp.mean((fwd(p, xb) - yb) ** 2)
        b = temp_decay(t, cfg.iters, cfg.warmup, *cfg.b_range)
        rl = sum(jnp.sum(1.0 - jnp.abs(
            2.0 * core.adaround_soft_targets(p[nm]) - 1.0) ** b)
            for nm in p)
        rl = jnp.where(t < cfg.warmup * cfg.iters, 0.0,
                       cfg.lambda_coeff * rl)
        return rec + rl

    @jax.jit
    def step(carry, t):
        p, opt_state, key = carry
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (bs,), 0, n)
        loss, grads = jax.value_and_grad(loss_fn)(p, x2[idx], y2[idx], t)
        updates, opt_state = tx.update(grads, opt_state)
        p = optax.apply_updates(p, updates)
        return (p, opt_state, key), loss

    (params, _, _), losses = jax.lax.scan(
        step, (params, opt_state, rng), jnp.arange(cfg.iters))
    out = {}
    for name in layers:
        L = layers[name]
        out[name] = {"w_alpha": params[name], "w_delta": L["delta"],
                     "w_zp": L["zp"]}
    out["recon_losses"] = losses
    return out


def capture_layer_io(model, variables, example_args,
                     mode: str = "fp") -> Dict[str, Tuple]:
    """{name: (x_in, y_out)} via the capture ctx (replaces reference
    save_in_out_data hooks, qdiff/utils.py:228)."""
    from viditq_tpu.quant.qlinear import QuantCtx
    _, inter = model.apply(
        variables, *example_args, qctx=QuantCtx(mode=mode, capture=True),
        mutable=["intermediates"])
    flat = traverse_util.flatten_dict(inter["intermediates"])
    ins, outs = {}, {}
    for path, val in flat.items():
        if path[-1] == "input":
            ins[path_to_dotted(path[:-1])] = val[0]
        elif path[-1] == "output":
            outs[path_to_dotted(path[:-1])] = val[0]
    return {k: (ins[k], outs[k]) for k in ins if k in outs}


# ---------------------------------------------------------------------------
# General block-granularity reconstruction (reference block_reconstruction,
# qdiff/optimization/block_recon.py:31: jointly optimize EVERY quant layer
# in one transformer block against the block's FP output; the rounding
# regularizer sums over all of the block's AdaRound quantizers,
# qdiff/utils.py:169-176).
# ---------------------------------------------------------------------------

def block_reconstruction(block_apply: Callable, block_vars: Dict,
                         x_fp: jnp.ndarray, y_fp: jnp.ndarray,
                         batch_args: Tuple,
                         cfg: ReconConfig = ReconConfig(),
                         rng: Optional[jnp.ndarray] = None) -> Dict:
    """Optimize all AdaRound alphas of one block jointly.

    block_apply(variables, x, *batch_args_row) -> block output, running the
    block in quant mode with soft AdaRound targets. block_vars: {'params',
    'quant'} subtrees of the block (weight tables already calibrated —
    w_alpha leaves exist and are adaround-initialized). x_fp [NB, N, C]
    captured block inputs; y_fp matching FP block outputs; batch_args:
    per-row extra inputs (y, t0, mask, ...), leading dim NB.

    Returns the block's 'quant' subtree with optimized w_alpha leaves.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    flat_q = traverse_util.flatten_dict(block_vars["quant"])
    alpha_paths = sorted(p for p in flat_q if p[-1] == "w_alpha")
    if not alpha_paths:
        return block_vars["quant"]
    train = {str(i): flat_q[p].astype(jnp.float32)
             for i, p in enumerate(alpha_paths)}
    n = x_fp.shape[0]
    bs = min(cfg.batch_size, n)
    x_fp = x_fp.astype(jnp.float32)
    y_fp = y_fp.astype(jnp.float32)

    def fwd(p, xb, argsb):
        fq = dict(flat_q)
        for i, path in enumerate(alpha_paths):
            fq[path] = p[str(i)]
        qv = traverse_util.unflatten_dict(fq)
        return block_apply({"params": block_vars["params"], "quant": qv},
                           xb, *argsb)

    def loss_fn(p, xb, yb, argsb, t):
        rec = jnp.mean((fwd(p, xb, argsb) - yb) ** 2)
        b = temp_decay(t, cfg.iters, cfg.warmup, *cfg.b_range)
        rl = sum(jnp.sum(1.0 - jnp.abs(
            2.0 * core.adaround_soft_targets(p[k]) - 1.0) ** b)
            for k in p)
        rl = jnp.where(t < cfg.warmup * cfg.iters, 0.0,
                       cfg.lambda_coeff * rl)
        return rec + rl

    tx = optax.adam(cfg.lr_alpha)
    opt_state = tx.init(train)

    @jax.jit
    def step(carry, t):
        p, opt_state, key = carry
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (bs,), 0, n)
        argsb = jax.tree.map(
            lambda a: a[idx] if (hasattr(a, "shape") and a.ndim > 0
                                 and a.shape[0] == n) else a,
            batch_args)
        loss, grads = jax.value_and_grad(loss_fn)(
            p, x_fp[idx], y_fp[idx], argsb, t)
        updates, opt_state = tx.update(grads, opt_state)
        p = optax.apply_updates(p, updates)
        return (p, opt_state, key), loss

    (train, _, _), losses = jax.lax.scan(
        step, (train, opt_state, rng), jnp.arange(cfg.iters))
    for i, path in enumerate(alpha_paths):
        flat_q[path] = train[str(i)]
    quant = traverse_util.unflatten_dict(flat_q)
    return quant


def capture_block_io(model, variables, example_args,
                     mode: str = "fp") -> Dict:
    """Run the model once with capture and collect block-granularity IO.

    Returns {'blocks': {idx: (x_in, y_out)}, 'y': ..., 't0': ...} — the
    per-block input/output plus the shared block context the model sows
    (replaces the reference save_in_out_data block hooks). mode='quant'
    (hard rounding) captures the quantized-input view for asym recon."""
    from viditq_tpu.quant.qlinear import QuantCtx
    _, inter = model.apply(
        variables, *example_args,
        qctx=QuantCtx(mode=mode, capture=True, soft_targets=False),
        mutable=["intermediates"])
    flat = traverse_util.flatten_dict(inter["intermediates"])
    out = {"blocks": {}}
    for path, val in flat.items():
        leaf = path[-1]
        v = val[0]
        if leaf in ("block_in", "block_out") and len(path) >= 2:
            name = path[-2]
            if not name.startswith("blocks_"):
                continue
            idx = int(name.split("_")[1])
            slot = out["blocks"].setdefault(idx, [None, None])
            slot[0 if leaf == "block_in" else 1] = v
        elif leaf == "block_ctx_y":
            out["y"] = v
        elif leaf == "block_ctx_t0":
            out["t0"] = v
    out["blocks"] = {i: tuple(v) for i, v in out["blocks"].items()
                     if v[0] is not None and v[1] is not None}
    return out


def _standalone_block(model, i: int):
    """Build the standalone block module matching model block i (unrolled
    naming 'blocks_{i}'), in float32 for reconstruction gradients.
    Returns (module, extra_arg) where extra_arg is the block's non-batch
    input (STDiT tpe for block 0 / PixArt HW)."""
    import jax.numpy as _jnp
    from viditq_tpu.models.pixart import PixArt, PixArtBlock
    from viditq_tpu.models.stdit import STDiT, STDiTBlock

    if isinstance(model, STDiT):
        tpe = (None if (model.no_temporal_pos_emb or i != 0)
               else _jnp.asarray(model.temporal_pos_embed(), _jnp.float32))
        mod = STDiTBlock(
            model.hidden_size, model.num_heads, d_s=model.num_spatial,
            d_t=model.num_temporal, mlp_ratio=model.mlp_ratio,
            resolver=model.resolver, prefix=f"blocks.{i}",
            dtype=_jnp.float32)
        return mod, tpe
    if isinstance(model, PixArt):
        sr = (model.kv_compress_scale
              if i in model.kv_compress_layers else 1)
        h = w = model.input_size // model.patch_size
        mod = PixArtBlock(
            model.hidden_size, model.num_heads, mlp_ratio=model.mlp_ratio,
            qk_norm=model.qk_norm,
            sampling=model.kv_compress_sampling if sr > 1 else None,
            sr_ratio=sr, resolver=model.resolver, prefix=f"blocks.{i}",
            dtype=_jnp.float32)
        return mod, (h, w)
    raise NotImplementedError(
        f"block reconstruction not wired for {type(model).__name__}")


def model_block_reconstruction(model, variables: Dict, example_args,
                               cfg: ReconConfig = ReconConfig(),
                               mask=None, asym: bool = True,
                               rng: Optional[jnp.ndarray] = None) -> Dict:
    """Block-granularity reconstruction over every transformer block.

    The recursion analog of the reference model_reconstruction
    (qdiff/optimization/model_recon.py:13-52) at block granularity:
    captures each block's FP output targets in one forward, then jointly
    optimizes each block's AdaRound alphas against its FP output. With
    `asym` (the reference block_recon default: "use quant input to
    reconstruct fp output"), blocks reconstruct sequentially on their
    QUANTIZED inputs — re-captured through the already-reconstructed
    preceding blocks — so each block compensates accumulated quantization
    error. fp-list layers carry no quant state and are skipped naturally;
    kv_linear participates (the reference's kv_linear skip applies to LAYER
    recon, where its input shape differs — inside a block it reconstructs
    jointly).

    Requires the unrolled block form (scan_blocks=False) — per-block quant
    subtrees live at 'blocks_{i}'.
    """
    from viditq_tpu.quant.qlinear import QuantCtx
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    io = capture_block_io(model, variables, example_args)
    if not io["blocks"]:
        raise ValueError("no block IO captured — scan_blocks model? "
                         "block recon needs the unrolled form")
    y_ctx, t0_ctx = io["y"], io["t0"]
    B = y_ctx.shape[0]
    if mask is not None and mask.shape[0] != B:
        import numpy as _np
        mask = jnp.asarray(_np.tile(_np.asarray(mask),
                                    (B // mask.shape[0], 1)))

    variables = dict(variables)
    quant_all = dict(variables["quant"])
    qctx = QuantCtx(mode="quant", soft_targets=True)
    for k, i in enumerate(sorted(io["blocks"])):
        bname = f"blocks_{i}"
        if bname not in quant_all:
            continue
        x_in, y_out = io["blocks"][i]
        if asym:
            # quant-mode input through the already-reconstructed prefix
            variables["quant"] = quant_all
            io_q = capture_block_io(model, variables, example_args,
                                    mode="quant")
            x_in = io_q["blocks"][i][0]
        mod, extra = _standalone_block(model, i)

        def block_apply(vs, xb, yb, t0b, maskb, mod=mod, extra=extra):
            return mod.apply(vs, xb, yb, t0b, maskb, extra, qctx)

        bvars = {"params": variables["params"][bname],
                 "quant": quant_all[bname]}
        batch_args = (y_ctx, t0_ctx, mask)
        quant_all[bname] = block_reconstruction(
            block_apply, bvars, x_in, y_out, batch_args, cfg,
            jax.random.fold_in(rng, k))
    variables["quant"] = quant_all
    return variables
