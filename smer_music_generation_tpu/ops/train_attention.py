"""Pallas TPU fused TRAINING attention: scores -> softmax -> dropout -> V
with in-kernel PRNG mask generation and a recompute backward.

The reference contract puts dropout ON the attention weights
(``/root/reference/transformer.py:337-470`` passes ``dropout`` to
``nn.MultiheadAttention``), which rules out the stock flash kernel
(no weight dropout).  The XLA path — even with the fused backward of
docs/PERFORMANCE.md Finding 6 — still writes one (B, H, T, S) bf16
residual per attention block to HBM and reads it back in the backward
pass; at the packed-training shapes those residual streams are the
largest remaining HBM term (Finding 5/6 bound analysis).

This kernel stores NO O(T*S) residual at all:

* forward: grid ``(B*H, T/128)``; each program loads its q block plus
  the full (S, D) K/V for the batch-head (S <= 1024 by the same static
  gate as the bf16 residual), computes the full (blk_q, S) score block in
  VMEM, does an exact (non-online) f32 softmax, generates the dropout
  keep mask with a counter-based hash RNG (murmur3 fmix32 over
  (key, bh, row, col) in plain uint32 vector ops — bit-identical in
  compiled and interpret modes, unlike ``pltpu.prng_random_bits`` which
  the off-TPU interpreter stubs to zeros), and writes only the
  (blk_q, D) output;
* backward: grid ``(B*H,)``; recomputes scores/softmax per q block,
  REGENERATES the identical keep mask from the same seed, and
  accumulates dq/dk/dv — the classic flash trade of O(B*H*T*S*D)
  recompute FLOPs (~2% of the step) for O(B*H*T*S) HBM traffic.

Numerics mirror the unfused XLA path op-for-op (bf16 score rounding
after the f32-accumulated QK matmul, f32 softmax, bf16 weight cast,
bf16 dropout scaling, f32-accumulated V matmul) — but the dropout
STREAM differs (counter-hash RNG vs jax.random.bernoulli), so this is
a new numerics path: runs trained with it replay only with it.

``dropout_mask_reference`` exposes the exact in-kernel mask derivation
so tests can verify the fused output/gradients against a jnp twin fed
the same mask (tests/test_ops.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLK_Q = 128
# static shape gate, matches models/transformer._BF16_RESIDUAL_MAX_KLEN:
# the full (S, D) K/V and (blk_q, S) scores must fit VMEM
MAX_KLEN = 1024


def _bf16_round(x: float) -> float:
    """Static bf16 rounding of a Python float (trace-safe constant)."""
    import ml_dtypes

    return float(np.asarray(x).astype(ml_dtypes.bfloat16))


def _keep_threshold(rate: float) -> np.uint32:
    """uint32 threshold t with P(bits < t) = 1 - rate."""
    return np.uint32(min(round((1.0 - rate) * 2**32), 2**32 - 1))


def _seed_words(key: jax.Array) -> jax.Array:
    """Raw uint32 PRNG key -> (4,) int32 seed words for pltpu.prng_seed."""
    k = jnp.asarray(key, jnp.uint32).reshape(-1)
    k = jnp.pad(k, (0, max(0, 4 - k.shape[0])))[:4]
    return k.astype(jnp.int32)


def _fmix32(h):
    """murmur3 finalizer: full avalanche on uint32."""
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _hash_keep(seed_ref, bh, row0, blk_q, S, rate):
    """(blk_q, S) bool keep mask from a counter-based hash RNG.

    Deterministic in (seed words, batch-head, ABSOLUTE query row, key
    col): the backward pass regenerates the identical mask, and the
    derivation is plain uint32 vector arithmetic so compiled TPU,
    interpret mode, and the jnp oracle (``dropout_mask_reference``)
    agree bit-for-bit.
    """
    rows = jax.lax.broadcasted_iota(jnp.uint32, (blk_q, S), 0) + jnp.uint32(row0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (blk_q, S), 1)
    s0 = seed_ref[0].astype(jnp.uint32) ^ seed_ref[2].astype(jnp.uint32)
    s1 = seed_ref[1].astype(jnp.uint32) ^ seed_ref[3].astype(jnp.uint32)
    h = s0 + rows * np.uint32(0x9E3779B1)
    h = h ^ (cols * np.uint32(0x85EBCA77))
    h = h + jnp.uint32(bh) * np.uint32(0xC2B2AE3D)
    h = _fmix32(h ^ s1)
    h = _fmix32(h + s0)
    return h < _keep_threshold(rate)


# ----------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------
def _fwd_kernel(
    seed_ref,  # SMEM (4,) int32
    q_ref,  # (1, blk_q, D)
    k_ref,  # (1, S, D)
    v_ref,  # (1, S, D)
    valid_ref,  # (1, 1, S) int32, 1 = attendable key
    o_ref,  # (1, blk_q, D)
    *,
    blk_q: int,
    causal: bool,
    scale: float,
    rate: float,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    S = k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # mirror the XLA path: the einsum on bf16 inputs emits bf16, upcast after
    s = s.astype(jnp.bfloat16).astype(jnp.float32) * scale

    valid = valid_ref[0, 0] > 0  # (S,)
    mask = jnp.broadcast_to(valid[None, :], (blk_q, S))
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (blk_q, S), 0) + qi * blk_q
        cols = jax.lax.broadcasted_iota(jnp.int32, (blk_q, S), 1)
        mask = mask & (cols <= rows)
    s = jnp.where(mask, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m) * mask.astype(jnp.float32)
    l = jnp.sum(e, axis=-1, keepdims=True)
    w = e / jnp.maximum(l, 1e-30)  # rows with no valid key -> all-zero w
    w16 = w.astype(jnp.bfloat16)

    if rate > 0.0:
        keep = _hash_keep(seed_ref, bh, qi * blk_q, blk_q, S, rate)
        w16 = jnp.where(keep, w16 / jnp.bfloat16(1.0 - rate), jnp.bfloat16(0.0))

    o = jax.lax.dot_general(
        w16, v_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)


# ----------------------------------------------------------------------
# backward kernel: one program per (b, h), fori over q blocks
# ----------------------------------------------------------------------
def _bwd_kernel(
    seed_ref,  # SMEM (4,) int32
    q_ref,  # (1, T, D)
    k_ref,  # (1, S, D)
    v_ref,  # (1, S, D)
    valid_ref,  # (1, 1, S)
    g_ref,  # (1, T, D) cotangent of the output
    dq_ref,  # (1, T, D) f32
    dk_ref,  # (1, S, D) f32
    dv_ref,  # (1, S, D) f32
    *,
    blk_q: int,
    causal: bool,
    scale: float,
    rate: float,
):
    bh = pl.program_id(0)
    k = k_ref[0]
    v = v_ref[0]
    S, D = k.shape
    T = q_ref.shape[1]
    n_q = T // blk_q
    valid = valid_ref[0, 0] > 0

    dk_ref[0] = jnp.zeros((S, D), jnp.float32)
    dv_ref[0] = jnp.zeros((S, D), jnp.float32)

    def body(qi, _):
        q = q_ref[0, pl.ds(qi * blk_q, blk_q), :]
        g = g_ref[0, pl.ds(qi * blk_q, blk_q), :]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s.astype(jnp.bfloat16).astype(jnp.float32) * scale
        mask = jnp.broadcast_to(valid[None, :], (blk_q, S))
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (blk_q, S), 0) + qi * blk_q
            cols = jax.lax.broadcasted_iota(jnp.int32, (blk_q, S), 1)
            mask = mask & (cols <= rows)
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m) * mask.astype(jnp.float32)
        l = jnp.sum(e, axis=-1, keepdims=True)
        w = e / jnp.maximum(l, 1e-30)
        w16 = w.astype(jnp.bfloat16)

        if rate > 0.0:
            keep = _hash_keep(seed_ref, bh, qi * blk_q, blk_q, S, rate)
            wd16 = jnp.where(keep, w16 / jnp.bfloat16(1.0 - rate), jnp.bfloat16(0.0))
        else:
            keep = None
            wd16 = w16

        # dv += wd^T g   (f32 accumulate)
        dv_ref[0] += jax.lax.dot_general(
            wd16, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dwd = g v^T  -> back through dropout -> cast back to f32
        dwd = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            # the forward divided by the BF16-ROUNDED (1 - rate); the true
            # VJP uses that same constant (f32 1/(1-rate) would carry a
            # systematic ~0.17% scale bias at rate=0.1)
            dw = jnp.where(keep, dwd / _bf16_round(1.0 - rate), 0.0)
        else:
            dw = dwd
        # softmax VJP (w already zero on masked/no-valid-key rows)
        ds = w * (dw - jnp.sum(w * dw, axis=-1, keepdims=True))
        ds = ds * scale
        ds16 = ds.astype(jnp.bfloat16)
        dq_ref[0, pl.ds(qi * blk_q, blk_q), :] = jax.lax.dot_general(
            ds16, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_ref[0] += jax.lax.dot_general(
            ds16, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, n_q, body, 0)


# ----------------------------------------------------------------------
# host-side wrappers + custom VJP
# ----------------------------------------------------------------------
def _interp(interpret):
    """TPU-semantics interpreter off-TPU (implements pltpu.prng_*)."""
    return pltpu.InterpretParams() if interpret else False


def _run_forward(q, k, v, valid, key, causal, rate, blk_q, interpret):
    BH, T, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D**0.5)
    kernel = functools.partial(
        _fwd_kernel, blk_q=blk_q, causal=causal, scale=scale, rate=rate
    )
    grid = (BH, T // blk_q)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, blk_q, D), lambda bh, qi, *_: (bh, qi, 0)),
                pl.BlockSpec((1, S, D), lambda bh, qi, *_: (bh, 0, 0)),
                pl.BlockSpec((1, S, D), lambda bh, qi, *_: (bh, 0, 0)),
                pl.BlockSpec((1, 1, S), lambda bh, qi, *_: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, blk_q, D), lambda bh, qi, *_: (bh, qi, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((BH, T, D), q.dtype),
        interpret=_interp(interpret),
    )(_seed_words(key), q, k, v, valid)


def _run_backward(q, k, v, valid, key, g, causal, rate, blk_q, interpret):
    BH, T, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D**0.5)
    kernel = functools.partial(
        _bwd_kernel, blk_q=blk_q, causal=causal, scale=scale, rate=rate
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH,),
            in_specs=[
                pl.BlockSpec((1, T, D), lambda bh, *_: (bh, 0, 0)),
                pl.BlockSpec((1, S, D), lambda bh, *_: (bh, 0, 0)),
                pl.BlockSpec((1, S, D), lambda bh, *_: (bh, 0, 0)),
                pl.BlockSpec((1, 1, S), lambda bh, *_: (bh, 0, 0)),
                pl.BlockSpec((1, T, D), lambda bh, *_: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, T, D), lambda bh, *_: (bh, 0, 0)),
                pl.BlockSpec((1, S, D), lambda bh, *_: (bh, 0, 0)),
                pl.BlockSpec((1, S, D), lambda bh, *_: (bh, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, S, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, S, D), jnp.float32),
        ],
        interpret=_interp(interpret),
    )(_seed_words(key), q, k, v, valid, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_dropout_attention(
    q: jax.Array,  # (B, T, H, D) bf16
    k: jax.Array,  # (B, S, H, D) bf16
    v: jax.Array,  # (B, S, H, D) bf16
    kv_valid: jax.Array,  # (B, S) bool/int, 1 = attendable key
    key: jax.Array,  # raw uint32 PRNG key (dropout stream)
    rate: float,
    causal: bool = False,
    blk_q: int = DEFAULT_BLK_Q,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """softmax(round_bf16(QK^T)/sqrt(D)) -> weight dropout -> V, fused.

    Returns (B, T, H, D) in q.dtype.  T must be a multiple of ``blk_q``
    and S <= MAX_KLEN (the caller gates; see models/transformer).
    """
    out, _ = _fda_fwd(q, k, v, kv_valid, key, rate, causal, blk_q, interpret)
    return out


def _reshape_in(q, k, v, kv_valid):
    B, T, H, D = q.shape
    S = k.shape[1]
    qr = q.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    kr = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    vr = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    valid = jnp.repeat(kv_valid.astype(jnp.int32), H, axis=0)[:, None, :]  # (B*H, 1, S)
    return qr, kr, vr, valid


def _fda_fwd(q, k, v, kv_valid, key, rate, causal, blk_q, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H, D = q.shape
    qr, kr, vr, valid = _reshape_in(q, k, v, kv_valid)
    o = _run_forward(qr, kr, vr, valid, key, causal, rate, blk_q, interpret)
    out = o.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    return out, (q, k, v, kv_valid, key)


def _fda_bwd(rate, causal, blk_q, interpret, res, g):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q, k, v, kv_valid, key = res
    B, T, H, D = q.shape
    S = k.shape[1]
    qr, kr, vr, valid = _reshape_in(q, k, v, kv_valid)
    gr = g.astype(q.dtype).transpose(0, 2, 1, 3).reshape(B * H, T, D)
    dq, dk, dv = _run_backward(
        qr, kr, vr, valid, key, gr, causal, rate, blk_q, interpret
    )
    dq = dq.reshape(B, H, T, D).transpose(0, 2, 1, 3).astype(q.dtype)
    dk = dk.reshape(B, H, S, D).transpose(0, 2, 1, 3).astype(k.dtype)
    dv = dv.reshape(B, H, S, D).transpose(0, 2, 1, 3).astype(v.dtype)
    f0 = functools.partial(np.zeros, dtype=jax.dtypes.float0)
    return dq, dk, dv, f0(kv_valid.shape), f0(key.shape)


fused_dropout_attention.defvjp(_fda_fwd, _fda_bwd)


# ----------------------------------------------------------------------
# test oracles
# ----------------------------------------------------------------------
def dropout_mask_reference(key, B, H, T, S, rate, blk_q=DEFAULT_BLK_Q):
    """The exact keep mask the fused kernel generates, as (B, H, T, S)
    bool — pure jnp (the hash is plain uint32 arithmetic), so tests can
    feed the identical mask to a jnp twin on any backend.  ``blk_q`` is
    accepted for signature parity but the mask depends only on absolute
    row indices, not the block decomposition."""
    del blk_q
    seeds = _seed_words(key)
    rows = jnp.arange(T, dtype=jnp.uint32)[None, :, None]
    cols = jnp.arange(S, dtype=jnp.uint32)[None, None, :]
    bhs = jnp.arange(B * H, dtype=jnp.uint32)[:, None, None]
    s0 = seeds[0].astype(jnp.uint32) ^ seeds[2].astype(jnp.uint32)
    s1 = seeds[1].astype(jnp.uint32) ^ seeds[3].astype(jnp.uint32)
    h = s0 + rows * np.uint32(0x9E3779B1)
    h = h ^ (cols * np.uint32(0x85EBCA77))
    h = h + bhs * np.uint32(0xC2B2AE3D)
    h = _fmix32(h ^ s1)
    h = _fmix32(h + s0)
    keep = h < _keep_threshold(rate)
    return keep.reshape(B, H, T, S)


def attention_dropout_twin(q, k, v, kv_valid, keep_mask, rate, causal=False):
    """jnp twin with an EXPLICIT keep mask: op-for-op the kernel math
    (bf16 score rounding, f32 softmax, bf16 dropout, f32 V-accumulate)."""
    B, T, H, D = q.shape
    S = k.shape[1]
    s = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)  # f32 accumulate, bf16 round — the kernel's rounding
    s = s.astype(jnp.float32) / (D**0.5)
    mask = jnp.broadcast_to(kv_valid[:, None, None, :].astype(bool), (B, H, T, S))
    if causal:
        rows = jnp.arange(T)[:, None]
        cols = jnp.arange(S)[None, :]
        mask = mask & (cols <= rows)[None, None]
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m) * mask.astype(jnp.float32)
    l = jnp.sum(e, axis=-1, keepdims=True)
    w = e / jnp.maximum(l, 1e-30)
    w16 = w.astype(jnp.bfloat16)
    if rate > 0.0:
        w16 = jnp.where(
            keep_mask.astype(bool), w16 / jnp.bfloat16(1.0 - rate), jnp.bfloat16(0.0)
        )
    out = jnp.einsum(
        "bhts,bshd->bthd", w16, v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)
