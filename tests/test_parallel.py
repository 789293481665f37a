"""Parallel-layer tests on the virtual 8-device CPU mesh: Ulysses attention
parity, TP param sharding, full sharded train step (the dryrun path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from viditq_tpu.parallel.mesh import make_mesh, param_sharding_rules, shard_params
from viditq_tpu.parallel.ulysses import ulysses_attention, sp_split
from viditq_tpu.models.layers import sdpa
from jax.sharding import PartitionSpec as P


def test_devices_available():
    assert len(jax.devices()) == 8


def test_ulysses_attention_matches_sdpa():
    mesh = make_mesh(dp=1, sp=4, tp=1, devices=jax.devices()[:4])
    rng = np.random.default_rng(0)
    B, N, H, D = 2, 32, 8, 16
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    out = ulysses_attention(q, k, v, mesh)
    want = sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), D ** -0.5).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_param_sharding_rules():
    assert param_sharding_rules("blocks_0/attn/q/kernel/") == P(None, "tp")
    assert param_sharding_rules("blocks_0/attn/proj/kernel/") == P("tp", None)
    assert param_sharding_rules("blocks_0/mlp/fc1/kernel/") == P(None, "tp")
    assert param_sharding_rules("blocks_0/mlp/fc2/kernel/") == P("tp", None)
    assert param_sharding_rules("t_embedder/fc1/kernel/") == P()
    assert param_sharding_rules("blocks_0/attn/q/bias/") == P()


@pytest.mark.parametrize("n", [8, 4, 2])
def test_dryrun_multichip(n):
    import importlib.util
    spec = importlib.util.spec_from_file_location("graft_entry",
                                                  "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(n)


def test_stdit_model_level_ulysses_sp():
    """STDiT with sp_mesh: self-attention via all-to-all matches the
    non-parallel model (reference SeqParallelAttention parity)."""
    import jax.numpy as jnp
    from viditq_tpu.models import STDiT
    mesh = make_mesh(dp=1, sp=4, tp=1, devices=jax.devices()[:4])
    kw = dict(input_size=(4, 16, 16), in_channels=4, patch_size=(1, 2, 2),
              hidden_size=64, depth=2, num_heads=4, caption_channels=32,
              model_max_length=8, dtype=jnp.float32)
    base = STDiT(**kw)
    spm = STDiT(sp_mesh=mesh, **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 16, 16)), jnp.float32)
    t = jnp.asarray([500.0, 100.0])
    y = jnp.asarray(rng.standard_normal((2, 1, 8, 32)), jnp.float32)
    mask = jnp.ones((2, 8), jnp.int32)
    variables = base.init(jax.random.PRNGKey(0), x, t, y, mask)
    out_base = base.apply(variables, x, t, y, mask)
    out_sp = spm.apply(variables, x, t, y, mask)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_base),
                               rtol=5e-4, atol=5e-4)
