"""Pallas fused attention: interpret-mode parity with the jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smer_music_generation_tpu.ops.attention import (
    attention_reference,
    fused_attention,
)


def rand_qkv(B=2, T=64, S=96, H=2, D=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype=jnp.float32)
    return q, k, v


def test_fused_matches_reference_full():
    q, k, v = rand_qkv()
    want = attention_reference(q, k, v)
    got = fused_attention(q, k, v, blk_q=32, blk_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_matches_reference_padded_lengths():
    q, k, v = rand_qkv(B=3, T=40, S=70)
    lens = jnp.array([70, 33, 1], dtype=jnp.int32)
    want = attention_reference(q, k, v, kv_valid_len=lens)
    got = fused_attention(q, k, v, kv_valid_len=lens, blk_q=32, blk_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_causal():
    q, k, v = rand_qkv(B=1, T=48, S=48)
    want = attention_reference(q, k, v, causal=True)
    got = fused_attention(q, k, v, causal=True, blk_q=16, blk_kv=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_non_multiple_shapes():
    # T and S not multiples of the block sizes -> internal padding path
    q, k, v = rand_qkv(B=1, T=37, S=53)
    want = attention_reference(q, k, v)
    got = fused_attention(q, k, v, blk_q=32, blk_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
