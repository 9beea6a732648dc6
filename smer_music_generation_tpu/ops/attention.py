"""Pallas TPU fused attention (flash-style) + jnp reference.

Replaces the unfused softmax(QK^T)V for the encoder / batched-scoring path
(the reference leans on ``torch.nn.MultiheadAttention``; SURVEY.md §2.4
maps it to "Pallas fused attention").  The kernel:

* grid ``(B, H, T/blk_q)``; each program streams KV blocks through VMEM
  with an online-softmax accumulator (running max / denominator), so the
  full (T, S) score matrix never exists in HBM;
* optional causal masking and key-padding masks are applied in-kernel from
  a prefetched per-row length vector (no (T, S) bias materialization);
* accumulation in float32 regardless of input dtype (bfloat16 inputs hit
  the MXU, the softmax stays fp32).

``attention_reference`` is the semantics oracle; the autoregressive decode
loop does NOT use this kernel (its per-step S is tiny — the win there is
the KV cache + single jitted while_loop, see ``infer/decode.py``).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def attention_reference(
    q: jax.Array,  # (B, T, H, D)
    k: jax.Array,  # (B, S, H, D)
    v: jax.Array,  # (B, S, H, D)
    kv_valid_len: Optional[jax.Array] = None,  # (B,) valid key length
    causal: bool = False,
) -> jax.Array:
    B, T, H, D = q.shape
    S = k.shape[1]
    scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) / math.sqrt(D)
    if kv_valid_len is not None:
        key_ok = jnp.arange(S)[None, :] < kv_valid_len[:, None]  # (B, S)
        scores = jnp.where(key_ok[:, None, None, :], scores, NEG_INF)
    if causal:
        cm = jnp.tril(jnp.ones((T, S), dtype=bool))
        scores = jnp.where(cm[None, None], scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", weights, v.astype(jnp.float32)).astype(q.dtype)


def _attn_kernel(
    len_ref,  # SMEM (B*H,) valid kv length per batch-head row
    q_ref,  # (1, blk_q, D)
    k_ref,  # (1, blk_kv, D) — current KV block (pipelined by the grid)
    v_ref,  # (1, blk_kv, D)
    o_ref,  # (1, blk_q, D)
    m_scr,  # VMEM (blk_q, 1) running max
    l_scr,  # VMEM (blk_q, 1) running denominator
    acc_scr,  # VMEM (blk_q, D) running numerator
    *,
    blk_q: int,
    blk_kv: int,
    causal: bool,
    scale: float,
):
    """One (q-block, kv-block) step of online softmax.

    KV blocks are the innermost grid dimension, so pallas double-buffers
    their HBM->VMEM copies while this step computes; the softmax state
    lives in scratch across the kv sweep.
    """
    qi = pl.program_id(1)
    si = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(si == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * scale
    k_blk = k_ref[0].astype(jnp.float32)
    v_blk = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (blk_q, blk_kv)
    valid_len = len_ref[pl.program_id(0)]
    col = si * blk_kv + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_kv), 1)
    mask = col < valid_len
    if causal:
        row = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_kv), 0)
        mask = mask & (col <= row)
    s = jnp.where(mask, s, NEG_INF)

    m = m_scr[:]
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    correction = jnp.exp(m - m_new)
    m_scr[:] = m_new
    l_scr[:] = l_scr[:] * correction + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * correction + jax.lax.dot_general(
        p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(si == n_kv - 1)
    def _():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


def fused_attention(
    q: jax.Array,  # (B, T, H, D)
    k: jax.Array,  # (B, S, H, D)
    v: jax.Array,  # (B, S, H, D)
    kv_valid_len: Optional[jax.Array] = None,
    causal: bool = False,
    blk_q: int = 128,
    blk_kv: int = 128,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention over (B, T|S, H, D) tensors; pads T/S to blocks."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H, D = q.shape
    S = k.shape[1]
    if kv_valid_len is None:
        kv_valid_len = jnp.full((B,), S, dtype=jnp.int32)
    kv_valid_len = kv_valid_len.astype(jnp.int32)

    T_pad = int(np.ceil(T / blk_q)) * blk_q
    S_pad = int(np.ceil(S / blk_kv)) * blk_kv
    if T_pad != T:
        q = jnp.pad(q, ((0, 0), (0, T_pad - T), (0, 0), (0, 0)))
    if S_pad != S:
        k = jnp.pad(k, ((0, 0), (0, S_pad - S), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, S_pad - S), (0, 0), (0, 0)))

    # fuse batch and heads: (B*H, T, D)
    qh = q.transpose(0, 2, 1, 3).reshape(B * H, T_pad, D)
    kh = k.transpose(0, 2, 1, 3).reshape(B * H, S_pad, D)
    vh = v.transpose(0, 2, 1, 3).reshape(B * H, S_pad, D)

    kernel = functools.partial(
        _attn_kernel,
        blk_q=blk_q,
        blk_kv=blk_kv,
        causal=causal,
        scale=1.0 / math.sqrt(D),
    )
    grid = (B * H, T_pad // blk_q, S_pad // blk_kv)
    # broadcast per-batch lengths to per-(batch, head) so the SMEM index map
    # stays a plain identity (divisions in SMEM index maps fail to lower)
    kv_len_bh = jnp.repeat(kv_valid_len, H)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B * H,), lambda bh, t, s: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk_q, D), lambda bh, t, s: (bh, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_kv, D), lambda bh, t, s: (bh, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_kv, D), lambda bh, t, s: (bh, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_q, D), lambda bh, t, s: (bh, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, T_pad, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, D), jnp.float32),
        ],
        interpret=interpret,
    )(kv_len_bh, qh, kh, vh)

    out = out.reshape(B, H, T_pad, D).transpose(0, 2, 1, 3)
    return out[:, :T]
