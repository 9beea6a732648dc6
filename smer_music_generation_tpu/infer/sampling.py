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
    """Sample one token id per row under the mask; (B,) int32.

    One implementation of the mask + nucleus filter exists
    (:func:`nucleus_log_probs`); ``categorical`` over those unnormalized
    log-probs is exactly the renormalized filtered distribution, and is
    distribution-identical to :func:`masked_sample_gumbel` by the Gumbel
    trick (ADVICE r4: the filter was previously triplicated by hand).
    """
    logp = nucleus_log_probs(logits, allowed, p, temperature)
    return jax.random.categorical(rng, logp, axis=-1).astype(jnp.int32)


def greedy_sample(logits: jnp.ndarray, allowed: jnp.ndarray) -> jnp.ndarray:
    masked = jnp.where(allowed, logits, NEG_INF)
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)


def nucleus_log_probs(
    logits: jnp.ndarray,  # (B, V) float32
    allowed: jnp.ndarray,  # (B, V) bool
    p: Optional[float] = None,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Log-probs of the masked+nucleus-filtered (UNrenormalized) support:
    kept tokens carry their softmax log-prob, dropped tokens NEG_INF.
    ``argmax(nucleus_log_probs + gumbel)`` == :func:`masked_sample_gumbel`.
    """
    masked = jnp.where(allowed, logits, NEG_INF) / temperature
    logp = jax.nn.log_softmax(masked, axis=-1)
    if p is not None:
        # Sort-free nucleus: a token is kept iff the total mass STRICTLY
        # above its probability is < p — identical to "exclusive
        # sorted-prefix < p" for distinct probabilities (ties: all co-tied
        # tokens at the boundary are kept together, the measure-zero
        # difference from an arbitrary sort order).  Replaces the per-step
        # argsort (the bitonic sort was ~1/3 of the per-token budget on
        # v5e).  Dropped tokens go to hard NEG_INF: out-of-nucleus mass
        # must be EXACTLY 0 for distribution-identity across the samplers.
        probs = jnp.exp(logp)
        above = jnp.sum(
            probs[:, None, :] * (probs[:, None, :] > probs[:, :, None]), axis=-1
        )
        logp = jnp.where(above < p, logp, NEG_INF)
    return logp


def spec_accept_resample(
    u: jnp.ndarray,  # (B,) float32 Uniform(0,1) — acceptance draw
    gumbel: jnp.ndarray,  # (B, V) float32 — residual resample noise
    logits: jnp.ndarray,  # (B, V) float32
    allowed: jnp.ndarray,  # (B, V) bool
    draft: jnp.ndarray,  # (B,) int32 proposed token
    p: Optional[float] = None,
    temperature: float = 1.0,
):
    """One speculative-sampling step against a deterministic (delta) draft.

    Target distribution P is the masked nucleus/temperature distribution
    the baseline samples from; the draft proposal is the point mass at
    ``draft``.  Standard max-coupling: accept ``draft`` with probability
    P(draft); otherwise sample from the residual P restricted to
    V \\ {draft} (renormalization is argmax-invariant under Gumbel).
    The emitted marginal is EXACTLY P — same guarantee as Leviathan et
    al.'s speculative sampling, so spec decode is distribution-identical
    to the baseline sampler (bit-identical under greedy).

    Returns (token (B,), accepted (B,) bool).
    """
    logp = nucleus_log_probs(logits, allowed, p, temperature)
    # renormalize over the kept support: P(draft) needs the true
    # post-filter mass, not the pre-filter softmax value
    kept = logp > NEG_INF / 2
    norm = jnp.sum(jnp.where(kept, jnp.exp(logp), 0.0), axis=-1)
    B = logits.shape[0]
    p_draft = jnp.exp(logp[jnp.arange(B), draft]) / jnp.maximum(norm, 1e-38)
    accepted = u < p_draft
    # residual: the kept support minus the draft token
    excl = logp.at[jnp.arange(B), draft].set(NEG_INF)
    # all-mass-on-draft edge: residual empty, but then accept prob is 1
    # and the fallback argmax value is never selected
    alt = jnp.argmax(excl + gumbel, axis=-1).astype(jnp.int32)
    token = jnp.where(accepted, draft, alt)
    return token, accepted


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
    # by construction on nucleus_log_probs: the equivalence
    # ``masked_sample_gumbel == argmax(nucleus_log_probs + gumbel)`` that
    # the speculative-decode proof relies on cannot drift out of sync
    # (ADVICE r4: the filter was previously triplicated by hand)
    return jnp.argmax(
        nucleus_log_probs(logits, allowed, p, temperature) + gumbel, axis=-1
    ).astype(jnp.int32)
