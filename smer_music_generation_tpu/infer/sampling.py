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
    # Sort-free nucleus: a token is kept iff the total mass STRICTLY above
    # its probability is < p — identical to "exclusive sorted-prefix < p"
    # for distinct probabilities (ties: all co-tied tokens at the boundary
    # are kept together, the measure-zero difference from an arbitrary sort
    # order).  Replaces the per-step argsort (decode hot path: the bitonic
    # sort was ~1/3 of the per-token budget on v5e).
    above = jnp.sum(
        probs[:, None, :] * (probs[:, None, :] > probs[:, :, None]), axis=-1
    )
    keep = above < p
    filtered = jnp.where(keep, probs, 0.0)
    # hard -inf for zeroed tokens: banned/out-of-nucleus mass must be
    # EXACTLY 0 (log(eps) would leave ~1e-12 sampleable probability,
    # breaking distribution-identity with masked_sample_gumbel)
    logp = jnp.where(filtered > 0, jnp.log(jnp.maximum(filtered, 1e-38)), NEG_INF)
    choice = jax.random.categorical(rng, logp, axis=-1)
    return choice.astype(jnp.int32)


def greedy_sample(logits: jnp.ndarray, allowed: jnp.ndarray) -> jnp.ndarray:
    masked = jnp.where(allowed, logits, NEG_INF)
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)


def masked_sample_gumbel(
    gumbel: jnp.ndarray,  # (B, V) float32 pregenerated Gumbel(0,1) noise
    logits: jnp.ndarray,  # (B, V) float32
    allowed: jnp.ndarray,  # (B, V) bool
    p: Optional[float] = None,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Identical distribution to :func:`masked_sample`, but takes Gumbel
    noise generated OUTSIDE the decode loop (categorical sampling == argmax
    of log-probs + Gumbel noise).  A per-step ``jax.random.split`` is a
    ~20-op serial threefry chain that alone costs ~53 us/token on v5e;
    pregenerating all noise for the session in one parallel op removes it
    from the loop's critical path entirely."""
    masked = jnp.where(allowed, logits, NEG_INF) / temperature
    logp = jax.nn.log_softmax(masked, axis=-1)
    if p is not None:
        probs = jnp.exp(logp)
        above = jnp.sum(
            probs[:, None, :] * (probs[:, None, :] > probs[:, :, None]), axis=-1
        )
        logp = jnp.where(above < p, logp, NEG_INF)
    return jnp.argmax(logp + gumbel, axis=-1).astype(jnp.int32)
