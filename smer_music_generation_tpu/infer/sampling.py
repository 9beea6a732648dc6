"""Masked temperature / nucleus sampling, jit-compatible and batched.

Replaces the reference's numpy host sampling (``generation.py:11-38``).
Masked categorical sampling is the renormalized-limit equivalent of the
reference's "-100 logit overwrite + rejection" scheme: with banned logits
at -1e9 the banned mass is exactly 0 after softmax.

Nucleus rule (identical to ``generation.py:11-25``): keep the smallest
probability-sorted prefix whose cumulative mass exceeds ``p`` (the first
token that crosses the threshold is included), renormalize, sample.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def masked_sample(
    rng: jax.Array,
    logits: jnp.ndarray,  # (B, V) float32
    allowed: jnp.ndarray,  # (B, V) bool
    p: Optional[float] = None,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Sample one token id per row under the mask; (B,) int32."""
    masked = jnp.where(allowed, logits, NEG_INF) / temperature
    if p is None:
        return jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)

    probs = jax.nn.softmax(masked, axis=-1)
    sort_idx = jnp.argsort(-probs, axis=-1)
    sorted_p = jnp.take_along_axis(probs, sort_idx, axis=-1)
    csum = jnp.cumsum(sorted_p, axis=-1)
    keep = (csum - sorted_p) < p  # exclusive prefix below p -> kept
    filtered = jnp.where(keep, sorted_p, 0.0)
    filtered = filtered / jnp.maximum(filtered.sum(axis=-1, keepdims=True), 1e-12)
    choice = jax.random.categorical(rng, jnp.log(filtered + 1e-12), axis=-1)
    return jnp.take_along_axis(sort_idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


def greedy_sample(logits: jnp.ndarray, allowed: jnp.ndarray) -> jnp.ndarray:
    masked = jnp.where(allowed, logits, NEG_INF)
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)
