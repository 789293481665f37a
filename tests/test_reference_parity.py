"""Golden parity vs the actual reference implementation.

Loads the reference's own `qdiff/quantizer/base_quantizer.py` (torch) from
the read-only mount and checks our functional core produces identical
quantization parameters and fake-quant outputs. Skipped when the reference
isn't mounted. Nothing from the reference is copied into this repo — the
module is imported at test time purely as an oracle.
"""

import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference/qdiff/quantizer/base_quantizer.py"

pytestmark = [pytest.mark.heavy, pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference not mounted")]


class _Cfg(dict):
    """omegaconf-like shim: attribute access + .get()."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def load_ref_quantizer():
    spec = importlib.util.spec_from_file_location("ref_base_quantizer", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_ref(mod, **kw):
    cfg = _Cfg(n_bits=8, per_group=False, scale_method="min_max",
               round_mode="nearest", channel_dim=0)
    cfg.update(kw)
    q = mod.BaseQuantizer(cfg)
    q.module_name = "test"
    return q


@pytest.mark.parametrize("sym", [False, True])
@pytest.mark.parametrize("n_bits", [4, 8])
def test_tensorwise_minmax_fakequant_matches_reference(sym, n_bits):
    import torch
    import jax.numpy as jnp
    from viditq_tpu.quant import core
    from viditq_tpu.quant.spec import QuantSpec

    mod = load_ref_quantizer()
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((64, 32)) * 2).astype(np.float32)

    ref_q = make_ref(mod, n_bits=n_bits, sym=sym)
    with torch.no_grad():
        ref_out = ref_q(torch.from_numpy(x)).numpy()
    ref_delta = float(ref_q.delta)
    ref_zp = float(ref_q.zero_point)

    spec = QuantSpec(n_bits=n_bits, granularity="tensor", sym=sym,
                     round_mode="nearest")
    d, z = core.compute_qparams(jnp.asarray(x), spec)
    np.testing.assert_allclose(float(np.squeeze(np.asarray(d))), ref_delta,
                               rtol=1e-6)
    assert float(np.squeeze(np.asarray(z))) == ref_zp
    ours = np.asarray(core.fake_quant(jnp.asarray(x), d, z, spec))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-6)


def test_channelwise_weight_quant_matches_reference():
    """Per-channel weights: reference channel_dim=0 on [C_out, C_in] ==
    ours axis -1 on the transposed JAX [C_in, C_out] kernel."""
    import torch
    import jax.numpy as jnp
    from viditq_tpu.quant import core
    from viditq_tpu.quant.spec import QuantSpec

    mod = load_ref_quantizer()
    rng = np.random.default_rng(1)
    w_torch = (rng.standard_normal((48, 32)) * 0.3).astype(np.float32)

    ref_q = make_ref(mod, per_group="channel", channel_dim=0)
    with torch.no_grad():
        ref_out = ref_q(torch.from_numpy(w_torch)).numpy()

    spec = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                     round_mode="nearest")
    w_jax = jnp.asarray(w_torch.T)  # [C_in, C_out]
    d, z = core.compute_qparams(w_jax, spec)
    np.testing.assert_allclose(np.asarray(d)[0],
                               np.asarray(ref_q.delta).reshape(-1),
                               rtol=1e-6)
    ours = np.asarray(core.fake_quant(w_jax, d, z, spec)).T
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-6)


def test_tokenwise_dynamic_act_matches_reference():
    """Per-token dynamic act quant on [B, N, C] (the ViDiT-Q W8A8 core)."""
    import torch
    import jax.numpy as jnp
    from viditq_tpu.quant import core
    from viditq_tpu.quant.spec import QuantSpec

    mod = load_ref_quantizer()
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((4, 16, 24)) * 1.5).astype(np.float32)

    # The reference DynamicActQuantizer subclasses ActQuantizer and
    # re-inits per forward; replicate with a fresh ActQuantizer call.
    cfg = _Cfg(n_bits=8, per_group="token", scale_method="min_max",
               round_mode="nearest", channel_dim=0)
    ref_q = mod.ActQuantizer(cfg)
    ref_q.module_name = "act"
    with torch.no_grad():
        ref_out = ref_q(torch.from_numpy(x)).numpy()

    spec = QuantSpec(n_bits=8, granularity="token", round_mode="nearest",
                     dynamic=True)
    ours = np.asarray(core.fake_quant_dynamic(jnp.asarray(x), spec))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-6)
    # and the per-token deltas agree
    d, _ = core.compute_qparams(jnp.asarray(x), spec)
    np.testing.assert_allclose(np.asarray(d).reshape(-1),
                               np.asarray(ref_q.delta).reshape(-1),
                               rtol=1e-6)


def test_grid_search_matches_reference():
    import torch
    import jax.numpy as jnp
    from viditq_tpu.quant import core
    from viditq_tpu.quant.spec import QuantSpec

    mod = load_ref_quantizer()
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(128) * 1.0).astype(np.float32)
    x[0] = 30.0  # outlier so shrinkage is selected

    ref_q = make_ref(mod, n_bits=4, scale_method="grid_search_lp")
    ref_q.n_levels = 2 ** 4
    with torch.no_grad():
        ref_q.init_quant_params(torch.from_numpy(x), False)
    ref_delta = float(ref_q.delta_list[0, 0])

    spec = QuantSpec(n_bits=4, granularity="tensor",
                     scale_method="grid_search_lp")
    xj = jnp.asarray(x)
    x_min, x_max = core.minmax(xj, spec)
    d, z = core.qparams_grid_search(xj, x_min, x_max, spec)
    np.testing.assert_allclose(float(np.squeeze(np.asarray(d))), ref_delta,
                               rtol=1e-5)
