"""Generation-quality metrics.

The reference's metric harness is external (SURVEY §4: VBench-style
clip/clip_temp/vqa/flow parsed from a metrics.log the repo can't produce);
here the frame-level metrics are built in, and CLIP-based ones activate
when a CLIP checkpoint is available.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np


def frame_mse(a, b) -> float:
    """MSE between generations (metric.ipynb cell 2)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return float(jnp.mean((a - b) ** 2))


def psnr(a, b, data_range: float = 2.0) -> float:
    """PSNR over [-1, 1] images/videos."""
    mse = frame_mse(a, b)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def temporal_consistency(video) -> float:
    """Mean cosine similarity of consecutive frames — a CLIP-temp-style
    consistency proxy computable without a CLIP model.

    video: [C, T, H, W] or [B, C, T, H, W]."""
    v = jnp.asarray(video, jnp.float32)
    if v.ndim == 4:
        v = v[None]
    f = v.transpose(0, 2, 1, 3, 4).reshape(v.shape[0], v.shape[2], -1)
    a, b = f[:, :-1], f[:, 1:]
    num = jnp.sum(a * b, axis=-1)
    den = (jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-8)
    return float(jnp.mean(num / den))


def motion_magnitude(video) -> float:
    """Mean absolute inter-frame difference — a flow-score proxy (the
    reference's flow metric needs an external optical-flow model)."""
    v = jnp.asarray(video, jnp.float32)
    if v.ndim == 4:
        v = v[None]
    d = v[:, :, 1:] - v[:, :, :-1]
    return float(jnp.mean(jnp.abs(d)))


def clip_score(images, prompts: List[str], clip_encoder) -> float:
    """Image-text CLIP similarity. `clip_encoder` is a
    viditq_tpu.models.text_encoder.ClipEncoder whose underlying CLIP model
    has a vision tower; returns mean cosine(image emb, text emb)."""
    from transformers import AutoProcessor, FlaxCLIPModel
    model = FlaxCLIPModel.from_pretrained(clip_encoder)
    processor = AutoProcessor.from_pretrained(clip_encoder)
    imgs = np.clip((np.asarray(images, np.float32) + 1) / 2, 0, 1)
    imgs = (imgs * 255).astype(np.uint8).transpose(0, 2, 3, 1)
    inputs = processor(text=prompts, images=list(imgs), return_tensors="np",
                       padding=True)
    out = model(**inputs)
    ie = out.image_embeds / np.linalg.norm(out.image_embeds, axis=-1,
                                           keepdims=True)
    te = out.text_embeds / np.linalg.norm(out.text_embeds, axis=-1,
                                          keepdims=True)
    return float(np.mean(np.sum(ie * te, axis=-1)))


def quality_report(sample, fp_reference=None) -> dict:
    """Bundle of the built-in metrics for one generation."""
    rep = {}
    s = np.asarray(sample)
    if s.ndim in (4, 5):  # video [C,T,H,W] / [B,C,T,H,W]
        rep["temporal_consistency"] = temporal_consistency(s)
        rep["motion_magnitude"] = motion_magnitude(s)
    if fp_reference is not None:
        rep["mse_vs_fp"] = frame_mse(sample, fp_reference)
        rep["psnr_vs_fp"] = psnr(sample, fp_reference)
    return rep
