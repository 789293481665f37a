"""CLI smoke tests: the full public flow (get-calib-data -> ptq ->
quant-generate -> analysis) on tiny configs."""

import json
import os

import numpy as np
import pytest

from viditq_tpu import cli

pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli"))


def test_full_t2v_flow(outdir):
    common = ["--config", "configs/workload/opensora_tiny.py",
              "--save_dir", outdir, "--num_samples", "1"]
    cli.main(["get-calib-data"] + common)
    calib = os.path.join(outdir, "calib_data.npz")
    assert os.path.exists(calib)
    data = np.load(calib)
    assert data["xs"].shape[0] == 3  # 3 sampler steps

    cli.main(["ptq", "--config", "configs/workload/opensora_tiny.py",
              "--save_dir", outdir,
              "--ptq_config", "configs/opensora/w8a8_dynamic.yaml",
              "--calib_data", calib])
    qckpt = os.path.join(outdir, "quant_ckpt.npz")
    assert os.path.exists(qckpt)

    cli.main(["quant-generate"] + common +
             ["--ptq_config", "configs/opensora/w8a8_dynamic.yaml",
              "--quant_ckpt", qckpt])
    out = np.load(os.path.join(outdir, "quant_samples.npz"))["samples"]
    assert out.shape == (1, 4, 4, 8, 8)
    assert np.isfinite(out).all()


def test_quant_generate_native_and_smooth(outdir):
    cli.main(["quant-generate", "--config",
              "configs/workload/opensora_tiny.py",
              "--save_dir", outdir + "/native", "--num_samples", "1",
              "--ptq_config", "configs/opensora/w8a8_dynamic.yaml",
              "--backend", "native"])
    out = np.load(os.path.join(outdir, "native", "quant_samples.npz"))
    assert np.isfinite(out["samples"]).all()


def test_sensitivity_cli(outdir):
    cli.main(["get-sensitivity", "--config",
              "configs/workload/opensora_tiny.py",
              "--save_dir", outdir + "/sens", "--num_samples", "1",
              "--ptq_config", "configs/opensora/w8a8_dynamic.yaml",
              "--targets", "attn,mlp"])
    scores = json.load(open(os.path.join(outdir, "sens",
                                         "sensitivity.json")))
    assert set(scores) == {"attn", "mlp"}


def test_pixart_dpm_cli(outdir):
    cli.main(["quant-generate", "--config",
              "configs/workload/pixart_tiny.py",
              "--save_dir", outdir + "/pixart", "--num_samples", "1",
              "--ptq_config", "configs/pixart/w8a8.yaml"])
    out = np.load(os.path.join(outdir, "pixart", "quant_samples.npz"))
    assert out["samples"].shape == (1, 4, 8, 8)


def test_quant_generate_hybrid_plan(outdir):
    """backend_overrides plan: int8 MLPs + weight-only elsewhere."""
    import yaml, shutil
    # tiny-model copy of the hybrid plan (reuses the schema + overrides)
    with open("configs/opensora/w8a8_tpu_hybrid.yaml") as f:
        cfg = yaml.safe_load(f)
    path = os.path.join(outdir, "hybrid_tiny.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    cli.main(["quant-generate", "--config",
              "configs/workload/opensora_tiny.py",
              "--save_dir", outdir + "/hybrid", "--num_samples", "1",
              "--ptq_config", path, "--backend", "native"])
    out = np.load(os.path.join(outdir, "hybrid", "quant_samples.npz"))
    assert np.isfinite(out["samples"]).all()


def test_extract_features(outdir, tmp_path_factory):
    tp = tmp_path_factory.mktemp("feat")
    frames = np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3),
                                               np.uint8)
    vids = []
    for i in range(2):
        p = tp / f"v{i}.npz"
        np.savez(p, video=frames)
        vids.append(p)
    csv = tp / "d.csv"
    csv.write_text("\n".join(f"{v},clip {i}" for i, v in enumerate(vids)))
    cli.main(["extract-features", "--csv", str(csv), "--image_size", "16",
              "--num_frames", "2", "--batch_size", "2",
              "--save_dir", outdir + "/feat"])
    data = np.load(os.path.join(outdir, "feat", "features.npz"),
                   allow_pickle=True)
    assert data["latents"].shape == (2, 4, 2, 2, 2)  # [B, 4, T, H/8, W/8]


def test_hybrid_plan_packs_native_weights(outdir):
    """A plan whose native/weight_only backends come only from
    backend_overrides (default backend simulate) must still pack int weight
    slabs — regression: unpacked all-zero slabs passed the finite check
    while destroying the output (round-2 verification finding)."""
    d = outdir + "/hybrid"
    common = ["--config", "configs/workload/opensora_tiny.py",
              "--num_samples", "1"]
    cli.main(["inference"] + common + ["--save_dir", d])
    cli.main(["quant-generate"] + common +
             ["--save_dir", d,
              "--ptq_config", "configs/opensora/w8a8_tpu_hybrid.yaml"])
    fp = np.load(os.path.join(d, "fp_samples.npz"))["samples"]
    q = np.load(os.path.join(d, "quant_samples.npz"))["samples"]
    rel = np.linalg.norm(q - fp) / np.linalg.norm(fp)
    assert rel < 0.1, f"hybrid plan output diverged from fp: rel={rel}"


def test_ptq_standalone_registers_schedulers():
    """build_sampler must register samplers itself: `cli ptq` in a fresh
    process hit an empty SCHEDULERS registry (round-2 verification
    finding; masked in-suite by earlier imports)."""
    import importlib
    import sys as _sys

    from viditq_tpu.models import registry
    from viditq_tpu.utils import workload
    saved = dict(registry.SCHEDULERS)
    try:
        registry.SCHEDULERS.clear()
        _sys.modules.pop("viditq_tpu.samplers", None)
        sampler = workload.build_sampler({"scheduler": {
            "type": "iddpm", "num_sampling_steps": 3}})
        assert sampler is not None
    finally:
        registry.SCHEDULERS.update(saved)


def test_sampler_type_override_cli(outdir):
    """--sampler_type dpms / sa-solver drive get-calib-data and
    quant-generate end-to-end (reference t2i get_calib_data.py /
    quant_txt2img.py --sampler dispatch)."""
    d = outdir + "/samplers"
    common = ["--config", "configs/workload/pixart_tiny.py",
              "--save_dir", d, "--num_samples", "1"]
    cli.main(["get-calib-data"] + common + ["--sampler_type", "dpms"])
    xs = np.load(os.path.join(d, "calib_data.npz"))["xs"]
    assert xs.shape[1] == 2  # duplicated to the [cond; null] layout
    cli.main(["get-calib-data"] + common + ["--sampler_type", "sa-solver"])
    cli.main(["quant-generate"] + common +
             ["--ptq_config", "configs/pixart/w8a8.yaml",
              "--sampler_type", "sa-solver"])
    out = np.load(os.path.join(d, "quant_samples.npz"))["samples"]
    assert out.shape == (1, 4, 8, 8) and np.isfinite(out).all()


def test_ptq_with_block_reconstruction(outdir, monkeypatch):
    """`cli ptq` runs optimization-based reconstruction when the plan's YAML
    has quant.weight.optimization.params + AdaRound rounding (the reference
    use_optimization gate, t2i/scripts/ptq.py:320-359)."""
    from viditq_tpu.utils.config import load_quant_config
    plan = load_quant_config("configs/opensora/w4a8_adaround.yaml")
    assert plan.weight_opt.enabled and plan.weight_opt.granularity == "block"

    # shrink iters for the smoke run
    import viditq_tpu.utils.config as cfgmod
    orig = cfgmod.load_quant_config

    def fast(path, **kw):
        p = orig(path, **kw)
        if p.weight_opt is not None:
            import dataclasses
            p = dataclasses.replace(
                p, weight_opt=dataclasses.replace(p.weight_opt, iters=10))
        return p
    monkeypatch.setattr(cfgmod, "load_quant_config", fast)
    import viditq_tpu.cli as climod
    d = outdir + "/recon"
    common = ["--config", "configs/workload/opensora_tiny.py",
              "--save_dir", d, "--num_samples", "1"]
    climod.main(["get-calib-data"] + common)
    climod.main(["ptq", "--config", "configs/workload/opensora_tiny.py",
                 "--save_dir", d,
                 "--ptq_config", "configs/opensora/w4a8_adaround.yaml",
                 "--calib_data", os.path.join(d, "calib_data.npz")])
    ck = np.load(os.path.join(d, "quant_ckpt.npz"))
    alpha_keys = [k for k in ck.files if k.endswith("w_alpha")]
    assert alpha_keys, "AdaRound alphas must be in the quant ckpt"
    climod.main(["quant-generate"] + common +
                ["--ptq_config", "configs/opensora/w4a8_adaround.yaml",
                 "--quant_ckpt", os.path.join(d, "quant_ckpt.npz")])
    out = np.load(os.path.join(d, "quant_samples.npz"))["samples"]
    assert np.isfinite(out).all()


def test_export_cli(outdir):
    import viditq_tpu.cli as climod
    from viditq_tpu.utils.export import load_exported
    dst = os.path.join(outdir, "fwd.bin")
    climod.main(["export", "--config", "configs/workload/opensora_tiny.py",
                 "--save_dir", outdir + "/export",
                 "--ptq_config", "configs/opensora/w8a8_dynamic.yaml",
                 "--dst", dst, "--batch_size", "1"])
    import jax.numpy as jnp
    fn = load_exported(open(dst, "rb").read())
    out = fn(jnp.zeros((1, 4, 4, 8, 8), jnp.float32),
             jnp.zeros((1,), jnp.float32),
             jnp.zeros((1, 1, 8, 32), jnp.float32),
             jnp.ones((1, 8), jnp.int32))
    assert np.isfinite(np.asarray(out)).all()
