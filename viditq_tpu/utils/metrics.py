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


class ClipScorer:
    """Image/video-text CLIP similarity for sensitivity scoring — the
    perceptual leg of the reference's metric-decoupled sensitivity
    (`qdiff/analysis_tools/mixed_precision/metric.ipynb` parses a
    VBench-style CLIP score per quant config; the evaluator itself is
    external to the reference too).

    model_path: a LOCAL FlaxCLIPModel checkpoint directory (with its
    processor). Without one (this image ships no CLIP weights), a tiny
    random-init CLIP is built from config with a hash tokenizer — the
    *plumbing* (frame sampling, embedding, ranking loop) is exercised
    end-to-end but scores carry no perceptual meaning; pass a real
    checkpoint in production.
    """

    def __init__(self, model_path: Optional[str] = None,
                 max_frames: int = 4):
        self.max_frames = max_frames
        self._processor = None
        if model_path:
            from transformers import AutoProcessor, FlaxCLIPModel
            self.model = FlaxCLIPModel.from_pretrained(model_path)
            self._processor = AutoProcessor.from_pretrained(model_path)
            self.image_size = self.model.config.vision_config.image_size
            self.vocab = self.model.config.text_config.vocab_size
            self.max_len = \
                self.model.config.text_config.max_position_embeddings
        else:
            from transformers import CLIPConfig, FlaxCLIPModel
            cfg = CLIPConfig.from_dict({
                "text_config": {
                    "hidden_size": 32, "intermediate_size": 64,
                    "num_hidden_layers": 2, "num_attention_heads": 2,
                    "max_position_embeddings": 16, "vocab_size": 512,
                    "projection_dim": 16},
                "vision_config": {
                    "hidden_size": 32, "intermediate_size": 64,
                    "num_hidden_layers": 2, "num_attention_heads": 2,
                    "image_size": 32, "patch_size": 8,
                    "projection_dim": 16},
                "projection_dim": 16})
            self.model = FlaxCLIPModel(cfg, seed=0)
            self.image_size = 32
            self.vocab = 512
            self.max_len = 16

    def _tokenize(self, prompts: List[str]) -> np.ndarray:
        if self._processor is not None:
            return self._processor(
                text=prompts, return_tensors="np", padding="max_length",
                max_length=self.max_len, truncation=True)["input_ids"]
        # hash tokenizer for the config-built smoke model: stable ids in
        # [2, vocab) with BOS=0 / EOS=1 framing
        import zlib
        ids = np.ones((len(prompts), self.max_len), np.int32)
        for i, p in enumerate(prompts):
            # crc32, not hash(): python's hash is salted per-process
            # (PYTHONHASHSEED) and would make smoke-CLIP rankings
            # non-reproducible across runs
            toks = [0] + [2 + (zlib.crc32(w.encode()) % (self.vocab - 2))
                          for w in p.lower().split()][: self.max_len - 2]
            toks.append(1)
            ids[i, : len(toks)] = toks
        return ids

    def _frames(self, sample) -> np.ndarray:
        """[B,C,H,W] | [B,C,T,H,W] in [-1,1] -> [N,3,S,S] pixel values
        (CLIP normalization left to the processor path when present)."""
        import jax

        s = jnp.asarray(sample, jnp.float32)
        if s.ndim == 5:  # video: sample up to max_frames evenly
            T = s.shape[2]
            idx = np.unique(np.linspace(0, T - 1, self.max_frames)
                            .round().astype(int))
            s = s[:, :, idx].transpose(0, 2, 1, 3, 4)
            s = s.reshape(-1, *s.shape[2:])
        if s.shape[1] == 1:
            s = jnp.repeat(s, 3, axis=1)
        elif s.shape[1] != 3:
            s = s[:, :3]
        s = jnp.clip((s + 1.0) / 2.0, 0.0, 1.0)
        s = jax.image.resize(
            s, (s.shape[0], 3, self.image_size, self.image_size),
            method="bilinear")
        if self._processor is not None:
            # reproduce CLIPImageProcessor normalize on the resized frames
            mean = np.asarray(self._processor.image_processor.image_mean,
                              np.float32).reshape(1, 3, 1, 1)
            std = np.asarray(self._processor.image_processor.image_std,
                             np.float32).reshape(1, 3, 1, 1)
            s = (s - mean) / std
        return np.asarray(s)

    def score(self, sample, prompts: List[str]) -> float:
        """Mean cosine(image emb, text emb); videos average frame scores
        per prompt (the VBench CLIP-score convention)."""
        frames = self._frames(sample)
        ids = self._tokenize(list(prompts))
        n_rep = frames.shape[0] // max(len(prompts), 1)
        ids = np.repeat(ids, n_rep, axis=0)[: frames.shape[0]]
        out = self.model(input_ids=ids, pixel_values=frames)
        ie = out.image_embeds / np.linalg.norm(
            np.asarray(out.image_embeds), axis=-1, keepdims=True)
        te = out.text_embeds / np.linalg.norm(
            np.asarray(out.text_embeds), axis=-1, keepdims=True)
        return float(np.mean(np.sum(np.asarray(ie) * np.asarray(te),
                                    axis=-1)))


def make_sensitivity_metric(name: str, prompts: Optional[List[str]] = None,
                            clip_model_path: Optional[str] = None):
    """metric_fn(out, fp_reference) -> float (higher = more sensitive) for
    the sensitivity scans — one per axis of the reference's metric-decoupled
    MP loop (qdiff/analysis_tools/mixed_precision: clip / clip_temp / flow
    sensitivity vectors combined offline in metric.ipynb):
      'mse'       frame-MSE vs the FP generation (metric.ipynb cell 2)
      'clip'      CLIP-score degradation clip(fp) - clip(out)
      'clip_temp' temporal-consistency degradation (frame-cosine proxy of
                  the VBench clip_temp axis — no CLIP model needed)
      'flow'      flow-score degradation |motion(out) - motion(fp)| (mean
                  inter-frame |diff| proxy of the optical-flow axis)"""
    if name == "mse":
        return frame_mse
    if name == "flow":
        def flow_degradation(out, ref) -> float:
            return abs(motion_magnitude(out) - motion_magnitude(ref))

        return flow_degradation
    if name == "clip_temp":
        def tempcons_degradation(out, ref) -> float:
            return temporal_consistency(ref) - temporal_consistency(out)

        return tempcons_degradation
    if name == "clip":
        scorer = ClipScorer(clip_model_path)
        ps = prompts or ["a sample"]
        cache = {}

        def clip_degradation(out, ref) -> float:
            # key on the array object itself (held strongly): a freed
            # array's id() can be reused, which would subtract a stale
            # FP baseline from every later sensitivity score
            if cache.get("ref") is not ref:
                cache["ref"] = ref
                cache["score"] = scorer.score(ref, ps)
            return cache["score"] - scorer.score(out, ps)

        return clip_degradation
    raise ValueError(f"unknown sensitivity metric {name!r} "
                     "(expected 'mse', 'clip', 'clip_temp' or 'flow')")


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
