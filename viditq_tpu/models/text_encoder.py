"""Text encoders: T5 (flax, via transformers) and precomputed-embed loader.

Reference: `t2v/opensora/models/text_encoder/t5.py` (T5Embedder/T5Encoder)
and the precompute flow `t2v/scripts/get_text_embeds.py:19-95`. The quant
pipelines always run from precomputed embeds (ptq.py:93-102), so the live
encoder is optional and gated: transformers' flax T5 loads only when a
checkpoint path is given.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp


class T5Encoder:
    """t5.py:304-362 equivalent over transformers' FlaxT5EncoderModel."""

    def __init__(self, from_pretrained: str, model_max_length: int = 120,
                 dtype=jnp.float32):
        from transformers import AutoTokenizer, FlaxT5EncoderModel
        self.tokenizer = AutoTokenizer.from_pretrained(from_pretrained)
        self.model = FlaxT5EncoderModel.from_pretrained(from_pretrained,
                                                        dtype=str(dtype))
        self.model_max_length = model_max_length
        self.output_dim = self.model.config.d_model

    def encode(self, prompts: List[str]) -> Dict[str, jnp.ndarray]:
        """-> {'y': [B, 1, L, C], 'mask': [B, L]} (t5.py:356-360)."""
        tok = self.tokenizer(
            prompts, max_length=self.model_max_length, padding="max_length",
            truncation=True, return_tensors="np")
        out = self.model(input_ids=tok["input_ids"],
                         attention_mask=tok["attention_mask"])
        y = jnp.asarray(out.last_hidden_state)[:, None]
        return {"y": y, "mask": jnp.asarray(tok["attention_mask"])}


class PrecomputedTextEmbeds:
    """Cached text embeds (get_text_embeds.py:75-92 layout): npz with
    y [N, 2, 1, L, C] ([cond, null] pairs) and mask [N, L]."""

    def __init__(self, path: str):
        data = np.load(path)
        self.y = data["y"]
        self.mask = data["mask"]

    def select(self, batch_ids) -> Dict[str, jnp.ndarray]:
        """Index-select and flatten to the sampler's [cond; null] batch
        layout (iddpm/__init__.py:70-83)."""
        ids = np.asarray(batch_ids)
        y = self.y[ids]                       # [B, 2, 1, L, C]
        y = np.concatenate([y[:, 0], y[:, 1]], axis=0)  # [2B, 1, L, C]
        return {"y": jnp.asarray(y), "mask": jnp.asarray(self.mask[ids])}


def save_text_embeds(path: str, encoder: T5Encoder, prompts: List[str],
                     null_embedding: np.ndarray):
    """Precompute [cond, null] pairs for every prompt
    (get_text_embeds.py:19-95). `null_embedding` is the model's learned
    y_embedding [L, C] (CaptionEmbedder)."""
    enc = encoder.encode(prompts)
    y = np.asarray(enc["y"])                  # [N, 1, L, C]
    null = np.broadcast_to(null_embedding[None, None], y.shape)
    pairs = np.stack([y, null], axis=1)       # [N, 2, 1, L, C]
    np.savez(path, y=pairs, mask=np.asarray(enc["mask"]))


class ClipEncoder:
    """CLIP text encoder (reference text_encoder/clip.py FrozenCLIPEmbedder /
    ClipEncoder:82, used by Latte) over transformers' flax CLIP."""

    def __init__(self, from_pretrained: str, model_max_length: int = 77,
                 dtype=jnp.float32):
        from transformers import AutoTokenizer, FlaxCLIPTextModel
        self.tokenizer = AutoTokenizer.from_pretrained(from_pretrained)
        self.model = FlaxCLIPTextModel.from_pretrained(from_pretrained,
                                                       dtype=str(dtype))
        self.model_max_length = model_max_length
        self.output_dim = self.model.config.hidden_size

    def encode(self, prompts: List[str]) -> Dict[str, jnp.ndarray]:
        tok = self.tokenizer(prompts, max_length=self.model_max_length,
                             padding="max_length", truncation=True,
                             return_tensors="np")
        out = self.model(input_ids=tok["input_ids"],
                         attention_mask=tok["attention_mask"])
        # pooled last_hidden_state as [B, 1, L, C] (clip.py:97-101 keeps the
        # token sequence; Latte pools downstream)
        return {"y": jnp.asarray(out.last_hidden_state)[:, None],
                "mask": jnp.asarray(tok["attention_mask"])}

    def null(self, n: int) -> jnp.ndarray:
        tok = self.tokenizer([""] * n, max_length=self.model_max_length,
                             padding="max_length", return_tensors="np")
        out = self.model(input_ids=tok["input_ids"],
                         attention_mask=tok["attention_mask"])
        return jnp.asarray(out.last_hidden_state)[:, None]


class ClassEncoder:
    """Label-conditioning encoder for DiT (reference
    text_encoder/classes.py:7-20)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes

    def encode(self, labels: List[int]) -> Dict[str, jnp.ndarray]:
        return {"y": jnp.asarray(labels, jnp.int32), "mask": None}

    def null(self, n: int) -> jnp.ndarray:
        return jnp.full((n,), self.num_classes, jnp.int32)
