"""Encoder-only classifier (auxiliary experiment model).

Reference ``Classify_transformer`` (``model.py:8-56`` +
``transformer.py:144-228``): shared embedding + sinusoidal positions, an
encoder stack, mean pooling over time, a 128-d projection and two binary
heads.  Unused by the training driver in the reference but part of its
model-family surface.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .transformer import EncoderLayer, ModelConfig, _dense_init, sinusoidal_table


class ClassifyTransformer(nn.Module):
    cfg: ModelConfig
    hidden: int = 128
    n_heads_out: int = 2
    n_classes: int = 2

    def setup(self):
        c = self.cfg
        self.embedding = nn.Embed(
            c.vocab_size, c.d_model,
            embedding_init=nn.initializers.xavier_normal(), dtype=c.dtype,
        )
        self.pos_table = sinusoidal_table(c.max_len, c.d_model)
        self.pos_dropout = nn.Dropout(rate=c.pos_dropout)
        self.layers = [
            EncoderLayer(c, name=f"encoder_{i}") for i in range(c.num_encoder_layers)
        ]
        if c.final_norm:
            # reference Classifier builds its encoder with a final
            # LayerNorm too (transformer.py:180)
            self.norm_e = nn.LayerNorm(dtype=jnp.float32, name="norm_e")
        self.project = nn.Dense(self.hidden, kernel_init=_dense_init, dtype=jnp.float32)
        self.heads = [
            nn.Dense(self.n_classes, kernel_init=_dense_init, dtype=jnp.float32,
                     name=f"head_{i}")
            for i in range(self.n_heads_out)
        ]

    def __call__(
        self,
        src: jax.Array,
        src_pad_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, ...]:
        c = self.cfg
        x = self.embedding(src) * math.sqrt(c.d_model)
        T = src.shape[-1]
        x = x + self.pos_table[:T].astype(x.dtype)
        x = self.pos_dropout(x, deterministic=deterministic)
        attn_mask = None
        if src_pad_mask is not None:
            attn_mask = (~src_pad_mask)[:, None, None, :]
        for layer in self.layers:
            x = layer(x, attn_mask, deterministic)
        if c.final_norm:
            x = self.norm_e(x)
        if src_pad_mask is not None:
            valid = (~src_pad_mask)[:, :, None].astype(x.dtype)
            pooled = (x * valid).sum(axis=1) / jnp.maximum(valid.sum(axis=1), 1)
        else:
            pooled = x.mean(axis=1)
        h = self.project(pooled.astype(jnp.float32))
        return tuple(head(h) for head in self.heads)
