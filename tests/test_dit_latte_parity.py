"""DiT / Latte cross-framework forward parity vs the reference torch
models (oracle-imported, tests/ref_models.py) — round-2 VERDICT missing #5.

Same discipline as test_model_parity.py (STDiT/PixArt): random-init the
reference model (`t2v/opensora/models/dit/dit.py:75`, `latte/latte.py:33`),
convert its state_dict through the repo's own converter, and assert forward
parity to 2e-4. Covers both condition types (text pooled-token caption and
class-label embedding) and — for Latte — the alternating spatial/temporal
block layout with the temporal pos embed injected at block 1.
"""

import os

import numpy as np
import pytest

pytestmark = [pytest.mark.heavy, pytest.mark.skipif(
    not os.path.exists("/root/reference/t2v"), reason="reference not mounted")]


DIT_KW = dict(input_size=(4, 8, 8), in_channels=4, patch_size=(1, 2, 2),
              hidden_size=64, num_heads=4, caption_channels=32)


def _randomize(model, seed=11):
    import torch
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)


def _convert_and_check(ref, model, x, t, y):
    import jax
    import jax.numpy as jnp
    import flax.traverse_util as tu

    from viditq_tpu.utils.ckpt import convert_dit_checkpoint

    params = convert_dit_checkpoint(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(t), jnp.asarray(y))
    flat_t = tu.flatten_dict(dict(template)["params"])
    flat_c = tu.flatten_dict(params)
    missing = set(flat_t) - set(flat_c)
    extra = set(flat_c) - set(flat_t)
    assert not missing, f"missing params: {sorted(missing)[:8]}"
    assert not extra, f"extra params: {sorted(extra)[:8]}"
    for k in flat_t:
        assert flat_t[k].shape == flat_c[k].shape, (
            k, flat_t[k].shape, flat_c[k].shape)
    return np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                  jnp.asarray(t), jnp.asarray(y)))


def _inputs(rng, condition, num_classes=10, batch=2):
    x = rng.standard_normal((batch, 4, 4, 8, 8)).astype(np.float32)
    t = np.asarray([100.0, 500.0], np.float32)[:batch]
    if condition == "text":
        y = (rng.standard_normal((batch, 1, 1, 32)) * 0.5).astype(np.float32)
    else:
        y = rng.integers(0, num_classes, (batch,)).astype(np.int32)
    return x, t, y


@pytest.mark.parametrize("condition", ["text", "label_10"])
def test_dit_forward_parity(condition):
    import torch
    import jax.numpy as jnp

    from ref_models import load_dit_module
    from viditq_tpu.models import DiT

    mod = load_dit_module()
    torch.manual_seed(3)
    # class_dropout_prob > 0 so LabelEmbedder allocates the CFG null row
    # (blocks.py:455 `num_classes + use_cfg_embedding`) matching our
    # always-allocated table; eval() never applies the drop.
    ref = mod.DiT(depth=2, condition=condition, class_dropout_prob=0.1,
                  enable_flashattn=False, enable_layernorm_kernel=False,
                  **DIT_KW)
    _randomize(ref)
    ref.eval()

    rng = np.random.default_rng(3)
    x, t, y = _inputs(rng, condition)
    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(t),
                   torch.tensor(y).long() if condition != "text"
                   else torch.tensor(y)).numpy()

    model = DiT(depth=2, condition=condition, dtype=jnp.float32, **DIT_KW)
    got = _convert_and_check(ref, model, x, t, y)
    assert got.shape == want.shape, (got.shape, want.shape)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2e-4, rel


@pytest.mark.parametrize("condition", ["text", "label_10"])
def test_latte_forward_parity(condition):
    """latte.py:33-86: even blocks spatial over S tokens, odd blocks
    temporal over T tokens with pos_embed_temporal added at block 1, and
    the condition repeated (b t)/(b s)-wise."""
    import torch
    import jax.numpy as jnp

    from ref_models import load_latte_module
    from viditq_tpu.models import Latte

    mod = load_latte_module()
    torch.manual_seed(5)
    ref = mod.Latte(depth=4, condition=condition, class_dropout_prob=0.1,
                    enable_flashattn=False, enable_layernorm_kernel=False,
                    **DIT_KW)
    _randomize(ref)
    ref.eval()

    rng = np.random.default_rng(5)
    x, t, y = _inputs(rng, condition)
    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(t),
                   torch.tensor(y).long() if condition != "text"
                   else torch.tensor(y)).numpy()

    model = Latte(depth=4, condition=condition, dtype=jnp.float32, **DIT_KW)
    got = _convert_and_check(ref, model, x, t, y)
    assert got.shape == want.shape, (got.shape, want.shape)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2e-4, rel
