"""Flax encoder-decoder for masked-span music infilling.

TPU-first redesign of the reference model stack (``model.py:59-106`` +
``transformer.py:16-470``, a fork of ``torch.nn.Transformer`` that also
returns decoder cross-attention weights):

* shared src/tgt embedding scaled by sqrt(d_model), sinusoidal positions,
  post-LN residual blocks, ReLU FFN, xavier-uniform init — numerically the
  same architecture family as the trained reference artifact (d512 / h8 /
  4+4 / ff2048 / max_seq 2400, ``config/config.yaml:26-43``);
* attention is a single einsum-based module whose K/V projections can be
  primed once and reused as a decode cache — the autoregressive decode path
  (``infer/decode.py``) runs the encoder once, precomputes per-layer cross
  K/V, and steps the decoder with O(1) new work per token, replacing the
  reference's full re-forward per emitted token (``generation.py:209-225``);
* compute dtype is configurable (bfloat16 on TPU) with float32 params and
  float32 softmax/logits.

Everything is shape-static and jit-friendly; masks are boolean with
``True = attend``.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 4
    num_decoder_layers: int = 4
    d_ff: int = 2048
    max_len: int = 2400
    dropout: float = 0.1
    pos_dropout: float = 0.1
    dtype: Any = jnp.float32
    # Final LayerNorm after the encoder and decoder stacks, as in the
    # reference's torch.nn.Transformer fork (``transformer.py:54-61``
    # constructs encoder_norm/decoder_norm; applied at ``:274-275`` and
    # ``:329-330``).  On by default for architectural parity — the trained
    # reference checkpoints have these weights.
    final_norm: bool = True
    # Route encoder self-attention through the pallas flash kernel
    # (ops/attention.py) on deterministic passes.  Requires suffix padding
    # (the framework's collate/bucketing guarantees it).
    flash_encoder: bool = False
    # Route ALL training-path attention (encoder self, decoder self, cross)
    # through jax.experimental.pallas.ops.tpu.flash_attention — a fused
    # kernel WITH a custom VJP, so the (B, H, T, S) score matrices are
    # never materialized in HBM.  Measured on v5e at the flagship shape
    # (B8 / S2048 / T512): loss-exact to bf16 tolerance but ~15% SLOWER
    # than the XLA path (attention is not this model's train bottleneck) —
    # keep off for the flagship; intended for longer-sequence variants.
    # Divergences: attention-weight dropout is not applied on this path,
    # and the decoder's cross-attention weights are not returned (None).
    # Falls back to the XLA path when sequence lengths are not multiples
    # of the kernel block size (128).
    flash_training: bool = False
    # Save the attention-softmax autodiff residual in bfloat16 instead of
    # float32 (custom-vjp softmax; forward math unchanged — f32 scores and
    # f32 softmax, exactly as the reference contract).  The f32 (B, H, T, S)
    # softmax output is the largest per-layer residual the backward pass
    # re-reads; halving it is worth +7-35% full-step throughput at the real
    # packed-training shapes (key length <= 1024), but measured SLOWER past
    # that (-4% at 1280, -15% at 2048 — the upcast stops fusing), so the
    # rewrite statically gates on the key length.  Only active under bf16
    # compute (f32 runs keep exact-f32 gradients for parity tests).
    # Gradients round through bf16 where active: runs trained before this
    # flag replay only with bf16_attn_residual=False.  Measurements:
    # docs/PERFORMANCE.md "Finding 5".
    bf16_attn_residual: bool = True
    # Fuse softmax -> pad-zero -> cast -> dropout -> V-matmul into one
    # custom-VJP region on the training path so the whole chain stores a
    # single (B, H, T, S) residual (the bf16 weights) plus the RNG key —
    # the bool dropout keep-mask and the bf16 dropped weights are
    # regenerated in the backward pass instead of written to HBM.
    # Forward is bit-identical to the unfused bf16-residual path (same
    # ops, same RNG draws); gradients agree to rounding (hand-written
    # einsum cotangents accumulate in a different order than AD's).
    # Active only where that path is (bf16 compute, key length <= 1024)
    # and dropout is on.  Measurements: docs/PERFORMANCE.md "Finding 6".
    fused_attn_bwd: bool = True
    # Route training-path attention (encoder self, decoder self, cross)
    # through the pallas fused scores->softmax->dropout->V kernel with a
    # recompute backward and an in-kernel counter-hash dropout RNG
    # (ops/train_attention.py): NO O(T*S) residual reaches HBM at all —
    # the step this replaces still wrote one bf16 (B, H, T, S) residual
    # per attention block (fused_attn_bwd).  The dropout STREAM differs
    # from jax.random.bernoulli, so this is a new numerics path: opt-in,
    # runs trained with it replay only with it.  Engages under bf16
    # compute, dropout active, raw RNG keys, key length <= 1024 and
    # 128-multiple query lengths (the real packed-loader buckets — e.g.
    # 640/384 — are 128-multiples); everywhere else falls back to XLA.
    # MEASURED 2.1x SLOWER than the XLA path at the flagship shapes
    # (head_dim 64 wastes half the 128-lane width; XLA fuses across
    # heads) — stays off; it is the starting point for long-sequence
    # variants where the O(S^2) residuals dominate.  Full A/B and bound
    # analysis: docs/PERFORMANCE.md "Finding 7".
    fused_attn_train: bool = False
    # Rematerialize each encoder/decoder layer in the backward pass
    # (jax.checkpoint, nothing-saveable): the f32 (B, H, T, S) attention
    # score/weight temporaries and dropout masks are recomputed instead of
    # held as residuals, trading ~1/3 extra forward FLOPs for O(layers x
    # B x H x S^2) less HBM.  Extends the trainable envelope (the XLA path
    # OOMs at 32 x 2048 without it, docs/PERFORMANCE.md); measured
    # throughput effect documented there.  Numerics are exact (same ops,
    # same RNG draws, recomputed).
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.nhead


def sinusoidal_table(max_len: int, d_model: int) -> jnp.ndarray:
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


_dense_init = nn.initializers.xavier_uniform()

# Static key-length ceiling for the bf16 softmax residual (measured
# crossover on v5e, ModelConfig.bf16_attn_residual).
_BF16_RESIDUAL_MAX_KLEN = 1024


@jax.custom_vjp
def _softmax_bf16_residual(scores: Array) -> Array:
    """``jax.nn.softmax(scores, axis=-1)`` whose backward pass reads a
    bfloat16 copy of the output instead of the float32 original.  The
    forward value is the ordinary f32 softmax; only the saved residual
    (and therefore the gradient w.r.t. ``scores``) rounds through bf16."""
    return jax.nn.softmax(scores, axis=-1)


def _softmax_bf16_fwd(scores):
    w = jax.nn.softmax(scores, axis=-1)
    return w, w.astype(jnp.bfloat16)


def _softmax_bf16_bwd(w_bf16, g):
    w = w_bf16.astype(jnp.float32)
    return (w * (g - jnp.sum(w * g, axis=-1, keepdims=True)),)


_softmax_bf16_residual.defvjp(_softmax_bf16_fwd, _softmax_bf16_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attn_weights_dropout_matmul(scores, v, rng, any_valid, rate, dtype):
    """softmax -> pad-row zero -> cast -> dropout -> V-matmul with a fused
    backward pass that stores ONE residual for the whole chain.

    The straight-line version keeps three (B, H, T, S)-sized residuals per
    attention block: the bf16 softmax output (softmax VJP), the bool
    dropout keep-mask (dropout-where VJP), and the bf16 dropped weights
    (V-matmul VJP).  This fusion saves only the bf16 weights and the
    uint32 RNG key; the backward pass regenerates the keep-mask from the
    key (bit-identical — same ``jax.random.bernoulli`` call on the same
    key) and rebuilds the dropped weights with one elementwise select.
    Forward values are bit-identical to the unfused bf16-residual path
    (every op, dtype and RNG draw is the same); gradients agree to
    rounding — the hand-written einsum cotangents accumulate in a
    different order than the AD-generated ones.  Measurements:
    docs/PERFORMANCE.md "Finding 6".

    Args: scores f32 (B, H, T, S); v (B, S, H, hd) in ``dtype``; rng a raw
    uint32 PRNG key; any_valid f32 0/1 (B, 1, T, 1) marking query rows
    with at least one attendable key (multiplying by 0/1 is bit-identical
    to the unfused ``where`` on finite softmax outputs).  Returns
    (out (B, T, H, hd), dropped weights (B, H, T, S) in ``dtype``).
    """
    w = jax.nn.softmax(scores, axis=-1) * any_valid
    w = w.astype(dtype)
    keep = jax.random.bernoulli(rng, 1.0 - rate, w.shape)
    wd = jnp.where(keep, w / (1.0 - rate), 0.0)
    out = jnp.einsum("bhts,bshd->bthd", wd, v)
    return out, wd


def _attn_wdm_fwd(scores, v, rng, any_valid, rate, dtype):
    w = jax.nn.softmax(scores, axis=-1) * any_valid
    w = w.astype(dtype)
    keep = jax.random.bernoulli(rng, 1.0 - rate, w.shape)
    wd = jnp.where(keep, w / (1.0 - rate), 0.0)
    out = jnp.einsum("bhts,bshd->bthd", wd, v)
    # residual: the post-zero bf16 weights + the key.  keep/wd are
    # recomputed in the backward pass instead of stored; any_valid rides
    # along (tiny) only to size its zero cotangent.
    return (out, wd), (w, v, rng, any_valid)


def _attn_wdm_bwd(rate, dtype, res, gs):
    g, g_wd = gs
    w, v, rng, any_valid = res
    keep = jax.random.bernoulli(rng, 1.0 - rate, w.shape)
    wd = jnp.where(keep, w / (1.0 - rate), 0.0)
    dv = jnp.einsum("bhts,bthd->bshd", wd, g)
    dwd = jnp.einsum("bthd,bshd->bhts", g, v) + g_wd
    # dropout-where VJP, then the cast back to f32
    dw = jnp.where(keep, dwd / (1.0 - rate), 0.0).astype(jnp.float32)
    # pad-row zeroing needs no explicit VJP term: w is already zero on
    # those rows, so the softmax VJP below emits zero gradient there —
    # matching the unfused where(any_valid, ...) backward exactly.
    w32 = w.astype(jnp.float32)
    ds = w32 * (dw - jnp.sum(w32 * dw, axis=-1, keepdims=True))
    f0 = functools.partial(np.zeros, dtype=jax.dtypes.float0)
    return ds, dv, f0(rng.shape), jnp.zeros_like(any_valid)


_attn_weights_dropout_matmul.defvjp(_attn_wdm_fwd, _attn_wdm_bwd)


class MultiHeadAttention(nn.Module):
    """Einsum MHA with separable K/V projection for cache priming."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.q_proj = nn.Dense(c.d_model, kernel_init=_dense_init, dtype=c.dtype, name="q")
        self.k_proj = nn.Dense(c.d_model, kernel_init=_dense_init, dtype=c.dtype, name="k")
        self.v_proj = nn.Dense(c.d_model, kernel_init=_dense_init, dtype=c.dtype, name="v")
        self.out_proj = nn.Dense(c.d_model, kernel_init=_dense_init, dtype=c.dtype, name="out")

    def project_kv(self, kv_in: Array) -> Tuple[Array, Array]:
        """(B, S, D) -> ((B, S, H, hd), (B, S, H, hd)); used to prime caches."""
        c = self.cfg
        B, S, _ = kv_in.shape
        k = self.k_proj(kv_in).reshape(B, S, c.nhead, c.head_dim)
        v = self.v_proj(kv_in).reshape(B, S, c.nhead, c.head_dim)
        return k, v

    def attend(
        self,
        q_in: Array,
        k: Array,
        v: Array,
        mask: Optional[Array],
        deterministic: bool,
        kv_valid: Optional[Array] = None,
        causal: bool = False,
        fused_train: bool = False,
    ) -> Tuple[Array, Optional[Array]]:
        """q_in: (B, T, D); k/v: (B, S, H, hd); mask: broadcastable to
        (B, H, T, S), True = attend.  Returns (out, head-avg weights).
        When ``fused_train`` (caller checked the static gates) and the
        RNG is a raw key, runs the pallas fused dropout-attention kernel
        and returns None weights."""
        c = self.cfg
        B, T, _ = q_in.shape
        q = self.q_proj(q_in).reshape(B, T, c.nhead, c.head_dim)
        fused_drawn_rng = None
        if fused_train and kv_valid is not None:
            rng = self.make_rng("dropout")
            if not jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
                from ..ops.train_attention import fused_dropout_attention

                out = fused_dropout_attention(
                    q, k, v, kv_valid, rng, c.dropout, causal
                )
                out = out.reshape(B, T, c.d_model)
                return self.out_proj(out), None
            # typed key: fall back to the XLA path, reusing the drawn key
            # so the RNG stream stays aligned
            fused_drawn_rng = rng
        scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
        scores = scores / math.sqrt(c.head_dim)
        if mask is not None:
            scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
        bf16_residual_ok = (
            c.bf16_attn_residual
            and c.dtype == jnp.bfloat16
            and scores.shape[-1] <= _BF16_RESIDUAL_MAX_KLEN
        )
        if (
            bf16_residual_ok
            and c.fused_attn_bwd
            and c.dropout > 0.0
            and not deterministic
        ):
            rng = (
                fused_drawn_rng
                if fused_drawn_rng is not None
                else self.make_rng("dropout")
            )
            if not jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
                if mask is not None:
                    any_valid = jnp.any(mask, axis=-1, keepdims=True)
                    any_valid = any_valid.astype(jnp.float32)
                else:
                    any_valid = jnp.ones((1, 1, 1, 1), jnp.float32)
                out, weights = _attn_weights_dropout_matmul(
                    scores, v, rng, any_valid, c.dropout, c.dtype
                )
                out = out.reshape(B, T, c.d_model)
                return self.out_proj(out), weights.astype(jnp.float32).mean(axis=1)
            # typed PRNG keys fall through to the unfused path (the fused
            # VJP stores the key as raw uint32 residual); reuse the drawn
            # key below so RNG draws stay identical either way.
            drawn_rng = rng
        else:
            drawn_rng = fused_drawn_rng
        if bf16_residual_ok:
            weights = _softmax_bf16_residual(scores)
        else:
            weights = jax.nn.softmax(scores, axis=-1)
        # fully-masked query rows (all-pad) produce uniform weights; zero them
        if mask is not None:
            any_valid = jnp.any(mask, axis=-1, keepdims=True)
            weights = jnp.where(any_valid, weights, 0.0)
        weights = weights.astype(c.dtype)
        if c.dropout > 0.0 and not deterministic:
            rng = drawn_rng if drawn_rng is not None else self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - c.dropout, weights.shape)
            weights = jnp.where(keep, weights / (1.0 - c.dropout), 0.0)
        out = jnp.einsum("bhts,bshd->bthd", weights, v).reshape(B, T, c.d_model)
        return self.out_proj(out), weights.astype(jnp.float32).mean(axis=1)

    def __call__(
        self, q_in, kv_in, mask=None, deterministic=True,
        kv_valid=None, causal=False, fused_train=False,
    ):
        k, v = self.project_kv(kv_in)
        return self.attend(
            q_in, k, v, mask, deterministic,
            kv_valid=kv_valid, causal=causal, fused_train=fused_train,
        )

    def attend_flash(self, q_in: Array, kv_in: Array, kv_valid_len: Array) -> Array:
        """Fused (flash) self-attention; no weights returned, no dropout."""
        from ..ops.attention import fused_attention

        c = self.cfg
        B, T, _ = q_in.shape
        q = self.q_proj(q_in).reshape(B, T, c.nhead, c.head_dim)
        k, v = self.project_kv(kv_in)
        out = fused_attention(q, k, v, kv_valid_len=kv_valid_len)
        return self.out_proj(out.reshape(B, T, c.d_model))

    def attend_flash_vjp(
        self,
        q_in: Array,  # (B, T, D)
        kv_in: Array,  # (B, S, D)
        kv_valid: Array,  # (B, S) int32/bool, 1 = real token (keys-only mask)
        causal: bool,
    ) -> Array:
        """Differentiable flash attention (library kernel with custom VJP).

        Matches the XLA path's masking exactly: only KEYS are masked (pad
        queries still attend valid keys, as in ``decode``/``encode``), so
        q segment ids are all-ones and kv segment ids are the validity
        mask.  No attention-weight dropout on this path.
        """
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds,
            flash_attention,
        )

        c = self.cfg
        B, T, _ = q_in.shape
        q = self.q_proj(q_in).reshape(B, T, c.nhead, c.head_dim)
        k, v = self.project_kv(kv_in)
        seg = SegmentIds(
            q=jnp.ones((B, T), jnp.int32),
            kv=kv_valid.astype(jnp.int32),
        )
        out = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            segment_ids=seg,
            causal=causal,
            sm_scale=1.0 / math.sqrt(c.head_dim),
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, T, c.d_model)
        return self.out_proj(out.astype(c.dtype))


class FeedForward(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        c = self.cfg
        h = nn.Dense(c.d_ff, kernel_init=_dense_init, dtype=c.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(rate=c.dropout)(h, deterministic=deterministic)
        return nn.Dense(c.d_model, kernel_init=_dense_init, dtype=c.dtype, name="fc2")(h)


class EncoderLayer(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.self_attn = MultiHeadAttention(c, name="self_attn")
        self.ff = FeedForward(c, name="ff")
        self.norm1 = nn.LayerNorm(dtype=jnp.float32, name="norm1")
        self.norm2 = nn.LayerNorm(dtype=jnp.float32, name="norm2")
        self.drop1 = nn.Dropout(rate=c.dropout)
        self.drop2 = nn.Dropout(rate=c.dropout)

    def __call__(
        self, x, mask, deterministic=True, fused_train=False,
        kv_valid_len=None, kv_valid=None,
    ):
        # NOTE: ``deterministic`` and ``fused_train`` are plain Python
        # bools and must stay POSITIONAL at the call sites — under
        # cfg.remat they are nn.remat static_argnums (keyword args would
        # be traced and break `if fused_train` with a TracerBoolError).
        if kv_valid is not None and self.cfg.flash_training:
            attn_out = self.self_attn.attend_flash_vjp(x, x, kv_valid, causal=False)
        elif kv_valid_len is not None and deterministic and self.cfg.flash_encoder:
            attn_out = self.self_attn.attend_flash(x, x, kv_valid_len)
        else:
            attn_out, _ = self.self_attn(
                x, x, mask, deterministic,
                kv_valid=kv_valid, causal=False, fused_train=fused_train,
            )
        x = self.norm1(x + self.drop1(attn_out, deterministic=deterministic))
        x = self.norm2(x + self.drop2(self.ff(x, deterministic), deterministic=deterministic))
        return x


class DecoderLayer(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.self_attn = MultiHeadAttention(c, name="self_attn")
        self.cross_attn = MultiHeadAttention(c, name="cross_attn")
        self.ff = FeedForward(c, name="ff")
        self.norm1 = nn.LayerNorm(dtype=jnp.float32, name="norm1")
        self.norm2 = nn.LayerNorm(dtype=jnp.float32, name="norm2")
        self.norm3 = nn.LayerNorm(dtype=jnp.float32, name="norm3")
        self.drop1 = nn.Dropout(rate=c.dropout)
        self.drop2 = nn.Dropout(rate=c.dropout)
        self.drop3 = nn.Dropout(rate=c.dropout)

    def __call__(
        self, x, memory, self_mask, cross_mask, deterministic=True,
        fused_train=False, tgt_valid=None, mem_valid=None,
    ):
        # deterministic/fused_train: static positionals under remat (see
        # EncoderLayer.__call__ note)
        if tgt_valid is not None and self.cfg.flash_training:
            attn_out = self.self_attn.attend_flash_vjp(x, x, tgt_valid, causal=True)
            x = self.norm1(x + self.drop1(attn_out, deterministic=deterministic))
            cross_out = self.cross_attn.attend_flash_vjp(
                x, memory, mem_valid, causal=False
            )
            cross_weights = None
        else:
            attn_out, _ = self.self_attn(
                x, x, self_mask, deterministic,
                kv_valid=tgt_valid, causal=True, fused_train=fused_train,
            )
            x = self.norm1(x + self.drop1(attn_out, deterministic=deterministic))
            cross_out, cross_weights = self.cross_attn(
                x, memory, cross_mask, deterministic,
                kv_valid=mem_valid, causal=False, fused_train=fused_train,
            )
        x = self.norm2(x + self.drop2(cross_out, deterministic=deterministic))
        x = self.norm3(x + self.drop3(self.ff(x, deterministic), deterministic=deterministic))
        return x, cross_weights

    # ---- cached single/short-step decode (no dropout: inference only) ----
    def decode_step(self, x, self_k, self_v, self_mask, cross_k, cross_v, cross_mask):
        attn_out, _ = self.self_attn.attend(x, self_k, self_v, self_mask, True)
        x = self.norm1(x + attn_out)
        cross_out, w = self.cross_attn.attend(x, cross_k, cross_v, cross_mask, True)
        x = self.norm2(x + cross_out)
        x = self.norm3(x + self.ff(x, True))
        return x, w


class ScoreTransformer(nn.Module):
    """Seq2seq infilling model; `__call__` mirrors the reference forward
    (returns logits + per-layer head-averaged cross-attention weights)."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.embedding = nn.Embed(
            c.vocab_size,
            c.d_model,
            embedding_init=nn.initializers.xavier_normal(),
            dtype=c.dtype,
            name="embedding",
        )
        self.pos_table = sinusoidal_table(c.max_len, c.d_model)
        self.pos_dropout = nn.Dropout(rate=c.pos_dropout)
        enc_cls, dec_cls = EncoderLayer, DecoderLayer
        if c.remat:
            # static_argnums counts the bound module as arg 0:
            # EncoderLayer(self, x, mask, deterministic, fused_train, ...)
            # -> (3, 4); DecoderLayer(self, x, memory, self_mask,
            # cross_mask, deterministic, fused_train, ...) -> (5, 6).
            # Param tree is unchanged.
            enc_cls = nn.remat(EncoderLayer, static_argnums=(3, 4))
            dec_cls = nn.remat(DecoderLayer, static_argnums=(5, 6))
        self.encoder_layers = [
            enc_cls(c, name=f"encoder_{i}") for i in range(c.num_encoder_layers)
        ]
        self.decoder_layers = [
            dec_cls(c, name=f"decoder_{i}") for i in range(c.num_decoder_layers)
        ]
        self.fc = nn.Dense(
            c.vocab_size, kernel_init=_dense_init, dtype=jnp.float32, name="fc"
        )
        if c.final_norm:
            self.norm_e = nn.LayerNorm(dtype=jnp.float32, name="norm_e")
            self.norm_d = nn.LayerNorm(dtype=jnp.float32, name="norm_d")

    # ------------------------------------------------------------------
    def embed(self, tokens: Array, offset: int = 0, deterministic: bool = True) -> Array:
        c = self.cfg
        x = self.embedding(tokens) * math.sqrt(c.d_model)
        T = tokens.shape[-1]
        pos = jax.lax.dynamic_slice_in_dim(self.pos_table, offset, T, axis=0)
        x = x + pos.astype(x.dtype)
        return self.pos_dropout(x, deterministic=deterministic)

    def _fused_train_ok(self, deterministic: bool, T: int, S: int) -> bool:
        """Static gate for the pallas fused dropout-attention kernel."""
        from ..ops.train_attention import DEFAULT_BLK_Q, MAX_KLEN

        c = self.cfg
        return (
            c.fused_attn_train
            and not deterministic
            and c.dropout > 0.0
            and c.dtype == jnp.bfloat16
            and T % DEFAULT_BLK_Q == 0
            and S % 128 == 0
            and S <= MAX_KLEN
        )

    def encode(self, src: Array, src_pad_mask: Optional[Array] = None, deterministic: bool = True) -> Array:
        """src: (B, S) int32; src_pad_mask: (B, S) True = PAD (suffix)."""
        x = self.embed(src, deterministic=deterministic)
        attn_mask = None
        kv_valid_len = None
        kv_valid = None
        fused_train = self._fused_train_ok(deterministic, src.shape[1], src.shape[1])
        want_valid = (
            self.cfg.flash_training and src.shape[1] % 128 == 0
        ) or fused_train
        if src_pad_mask is not None:
            attn_mask = (~src_pad_mask)[:, None, None, :]  # (B,1,1,S) True=attend
            if self.cfg.flash_encoder:
                kv_valid_len = jnp.sum(~src_pad_mask, axis=1).astype(jnp.int32)
            if want_valid:
                kv_valid = ~src_pad_mask
        else:
            if self.cfg.flash_encoder:
                kv_valid_len = jnp.full((src.shape[0],), src.shape[1], dtype=jnp.int32)
            if want_valid:
                kv_valid = jnp.ones(src.shape, bool)
        for layer in self.encoder_layers:
            x = layer(x, attn_mask, deterministic, fused_train,
                      kv_valid_len=kv_valid_len, kv_valid=kv_valid)
        if self.cfg.final_norm:
            x = self.norm_e(x)
        return x

    def decode(
        self,
        tgt: Array,
        memory: Array,
        tgt_pad_mask: Optional[Array] = None,
        memory_pad_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Tuple[Array, Array]:
        B, T = tgt.shape
        x = self.embed(tgt, deterministic=deterministic)
        # the library flash kernel needs 128-multiple sequence lengths
        flash_ok = (
            self.cfg.flash_training
            and T % 128 == 0
            and memory.shape[1] % 128 == 0
        )
        if flash_ok:
            tgt_valid = (
                ~tgt_pad_mask if tgt_pad_mask is not None
                else jnp.ones((B, T), bool)
            )
            mem_valid = (
                ~memory_pad_mask if memory_pad_mask is not None
                else jnp.ones(memory.shape[:2], bool)
            )
            for layer in self.decoder_layers:
                x, _ = layer(
                    x, memory, None, None, deterministic, False,
                    tgt_valid=tgt_valid, mem_valid=mem_valid,
                )
            if self.cfg.final_norm:
                x = self.norm_d(x)
            logits = self.fc(x.astype(jnp.float32))
            return logits, None  # cross-attn weights unavailable on this path
        causal = jnp.tril(jnp.ones((T, T), dtype=bool))[None, None, :, :]
        if tgt_pad_mask is not None:
            self_mask = causal & (~tgt_pad_mask)[:, None, None, :]
        else:
            self_mask = causal
        cross_mask = None
        if memory_pad_mask is not None:
            cross_mask = (~memory_pad_mask)[:, None, None, :]
        # fused kernel gate: the decoder layer routes BOTH its attentions
        # through the kernel, so self (S=T) and cross (S=memory) must pass
        fused_train = self._fused_train_ok(
            deterministic, T, T
        ) and self._fused_train_ok(deterministic, T, memory.shape[1])
        tgt_valid = mem_valid = None
        if fused_train:
            tgt_valid = (
                ~tgt_pad_mask if tgt_pad_mask is not None
                else jnp.ones((B, T), bool)
            )
            mem_valid = (
                ~memory_pad_mask if memory_pad_mask is not None
                else jnp.ones(memory.shape[:2], bool)
            )
        all_weights = []
        for layer in self.decoder_layers:
            x, w = layer(
                x, memory, self_mask, cross_mask, deterministic, fused_train,
                tgt_valid=tgt_valid, mem_valid=mem_valid,
            )
            all_weights.append(w)
        if self.cfg.final_norm:
            x = self.norm_d(x)
        logits = self.fc(x.astype(jnp.float32))
        if any(w is None for w in all_weights):
            return logits, None  # fused-kernel path returns no weights
        return logits, jnp.stack(all_weights, axis=1)  # (B, L, T, S)

    def __call__(
        self,
        src: Array,
        tgt: Array,
        src_pad_mask: Optional[Array] = None,
        tgt_pad_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Tuple[Array, Array]:
        memory = self.encode(src, src_pad_mask, deterministic)
        return self.decode(tgt, memory, tgt_pad_mask, src_pad_mask, deterministic)

    # ------------------------------------------------------------------
    # KV-cache decode path (inference)
    # ------------------------------------------------------------------
    def init_cross_cache(self, memory: Array) -> Dict[str, Tuple[Array, Array]]:
        """Project encoder memory to per-layer cross K/V once per session."""
        return {
            f"layer_{i}": layer.cross_attn.project_kv(memory)
            for i, layer in enumerate(self.decoder_layers)
        }

    def init_self_cache(self, batch: int, max_len: int) -> Dict[str, Tuple[Array, Array]]:
        c = self.cfg
        shape = (batch, max_len, c.nhead, c.head_dim)
        zeros = jnp.zeros(shape, dtype=c.dtype)
        return {f"layer_{i}": (zeros, zeros) for i in range(c.num_decoder_layers)}

    def decode_step(
        self,
        token: Array,  # (B,) int32 — the token at position `index`
        index: Array,  # scalar int32 position
        self_cache: Dict[str, Tuple[Array, Array]],
        cross_cache: Dict[str, Tuple[Array, Array]],
        memory_pad_mask: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Tuple[Array, Array]]]:
        """One autoregressive step with O(1) new computation.

        Returns (logits (B, V), updated self_cache).  The self cache holds
        K/V for positions [0, index]; attention masks positions > index.
        """
        B = token.shape[0]
        # raw embedding + the absolute-position PE row in ONE add — the
        # exact computation of the full forward's embed() (and of the
        # fused kernel); the previous (emb + pe[0]) - pe[0] + pe[index]
        # could differ from it by a compute-dtype rounding (ADVICE r4)
        x = self.embedding(token[:, None]) * math.sqrt(self.cfg.d_model)
        pe_i = jax.lax.dynamic_index_in_dim(self.pos_table, index, axis=0, keepdims=True)
        x = (x + pe_i.astype(x.dtype)).astype(self.cfg.dtype)

        max_len = next(iter(self_cache.values()))[0].shape[1]
        positions = jnp.arange(max_len)[None, None, None, :]
        self_mask = positions <= index  # (1,1,1,S)
        cross_mask = None
        if memory_pad_mask is not None:
            cross_mask = (~memory_pad_mask)[:, None, None, :]

        new_cache = {}
        for i, layer in enumerate(self.decoder_layers):
            key = f"layer_{i}"
            k_cache, v_cache = self_cache[key]
            k_new, v_new = layer.self_attn.project_kv(x)
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k_new, index, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v_new, index, axis=1)
            new_cache[key] = (k_cache, v_cache)
            ck, cv = cross_cache[key]
            x, _ = layer.decode_step(x, k_cache, v_cache, self_mask, ck, cv, cross_mask)
        if self.cfg.final_norm:
            x = self.norm_d(x)
        logits = self.fc(x.astype(jnp.float32))
        return logits[:, 0, :], new_cache

    def decode_window(
        self,
        tokens: Array,  # (B, W) int32 — tokens at positions index..index+W-1
        index: Array,  # scalar int32: absolute position of tokens[:, 0]
        self_cache: Dict[str, Tuple[Array, Array]],
        cross_cache: Dict[str, Tuple[Array, Array]],
        memory_pad_mask: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Tuple[Array, Array]]]:
        """W-position cached decode for draft verification (spec decode).

        One weight pass scores all W positions: query row j (absolute
        position index+j) attends cache positions <= index+j, which makes
        logits[:, j] the exact next-token distribution given the prefix
        plus tokens[:, :j+1] — identical to W sequential ``decode_step``
        calls, at ~the cost of ONE (the B=1 step is HBM-weight-bound).
        K/V for all W positions are written into the cache; rows beyond a
        caller-accepted prefix are stale but sit at positions the masks
        exclude until they are overwritten.
        """
        W = tokens.shape[1]
        # raw embedding + absolute PE rows in one add (see decode_step):
        # bit-identical to W sequential steps AND to the full forward's
        # embed() at these positions (ADVICE r4: the subtract-re-add form
        # could flip near-tie argmaxes in compute dtype)
        x = self.embedding(tokens) * math.sqrt(self.cfg.d_model)
        pe = jax.lax.dynamic_slice_in_dim(self.pos_table, index, W, axis=0)
        x = (x + pe.astype(x.dtype)).astype(self.cfg.dtype)

        max_len = next(iter(self_cache.values()))[0].shape[1]
        positions = jnp.arange(max_len)[None, None, None, :]
        row_pos = index + jnp.arange(W)[None, None, :, None]
        self_mask = positions <= row_pos  # (1,1,W,max_len)
        cross_mask = None
        if memory_pad_mask is not None:
            cross_mask = (~memory_pad_mask)[:, None, None, :]

        new_cache = {}
        for i, layer in enumerate(self.decoder_layers):
            key = f"layer_{i}"
            k_cache, v_cache = self_cache[key]
            k_new, v_new = layer.self_attn.project_kv(x)
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k_new, index, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v_new, index, axis=1)
            new_cache[key] = (k_cache, v_cache)
            ck, cv = cross_cache[key]
            x, _ = layer.decode_step(x, k_cache, v_cache, self_mask, ck, cv, cross_mask)
        if self.cfg.final_norm:
            x = self.norm_d(x)
        logits = self.fc(x.astype(jnp.float32))
        return logits, new_cache  # (B, W, V)


def gen_nopeek_mask(length: int) -> jnp.ndarray:
    """Boolean causal mask, True = attend (replaces the reference's float
    -inf mask, ``dataset.py:786-799``)."""
    return jnp.tril(jnp.ones((length, length), dtype=bool))
