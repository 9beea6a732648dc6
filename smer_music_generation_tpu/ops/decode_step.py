"""Fused single-token decoder step as ONE pallas kernel.

The XLA decode step (``models/transformer.py ScoreTransformer.decode_step``)
is ~135 small HLO ops per token (4 layers x {projections, cached attention,
layernorms, FFN} at B~1); on v5e each op carries a few microseconds of fixed
overhead, so the step costs ~160 us/token while its pure HBM traffic bound
is ~40 us.  This kernel collapses the whole step — all decoder layers plus
the output projection — into a single ``pallas_call``:

* grid over decoder layers; per-layer weights are streamed HBM->VMEM by the
  pallas pipeline.  DMA count is what matters at this size, so weights are
  packed into THREE blocks per layer (attention mats / FFN mats / a single
  bias+scale strip) instead of one block per parameter;
* the activation is carried across grid steps in a VMEM scratch;
* K and V live interleaved in one cache array (lanes [0:D) = K, [D:2D) = V)
  so each attention chunk is ONE DMA; chunks beyond the valid length are
  skipped by predication, so per-token KV traffic scales with the *valid*
  prefix, not the allocated cache.  Attention is an online-softmax (flash)
  accumulator; head-wise reductions are MXU matmuls against block-diagonal
  indicator matrices (Mosaic cannot shape-cast the lane dimension);
* the current token's K/V enter the softmax in-kernel and are returned as
  an output row; the caller does one ``dynamic_update_slice`` into the
  cache.

Replaces the per-token re-forward of the reference serving path
(``generation.py:209-225``).  Numerics: bf16 matmuls with f32 accumulation,
f32 softmax and layernorms — the same dtype policy as the XLA path (which
rounds softmax weights to bf16; parity is tested to tolerance in
``tests/test_ops.py``).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512  # KV rows per DMA


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_decoder_weights(params: Any, cfg, vpad: int) -> Dict[str, jax.Array]:
    """Stack per-layer decoder weights into layer-major packed arrays.

    Cheap (one device copy); do it inside the decode jit so it is hoisted
    out of the token loop.  Packing layout (D = d_model, F = d_ff):

      w_attn (nl, D, 6D): [W_q | W_k | W_v | W_self_out | W_cross_q | W_cross_out]
      bias  (nl, 1, 7D + F) f32:
            [b_qkv (3D) | b_self_out | b_cross_q | b_cross_out | b_ff1 (F) | b_ff2]
      ln    (nl, 6, D) f32: norm{1,2,3} x {scale, bias}
      w_ff1 (nl, D, F), w_ff2 (nl, F, D)
      fc_w  (D, vpad) f32, fc_b (vpad,) f32 — padded slots biased to -1e9
    """
    p = params["params"] if "params" in params else params
    dt = cfg.dtype
    L = cfg.num_decoder_layers

    def stack(path_fn, dtype):
        return jnp.stack([path_fn(p[f"decoder_{i}"]).astype(dtype) for i in range(L)])

    packed = {
        "w_attn": stack(
            lambda lp: jnp.concatenate(
                [lp["self_attn"][m]["kernel"] for m in ("q", "k", "v", "out")]
                + [lp["cross_attn"]["q"]["kernel"], lp["cross_attn"]["out"]["kernel"]],
                axis=1,
            ),
            dt,
        ),
        "bias": stack(
            lambda lp: jnp.concatenate(
                [lp["self_attn"][m]["bias"] for m in ("q", "k", "v", "out")]
                + [
                    lp["cross_attn"]["q"]["bias"],
                    lp["cross_attn"]["out"]["bias"],
                    lp["ff"]["fc1"]["bias"],
                    lp["ff"]["fc2"]["bias"],
                ]
            )[None, :],
            jnp.float32,
        ),
        "ln": stack(
            lambda lp: jnp.stack(
                [
                    lp["norm1"]["scale"], lp["norm1"]["bias"],
                    lp["norm2"]["scale"], lp["norm2"]["bias"],
                    lp["norm3"]["scale"], lp["norm3"]["bias"],
                ]
            ),
            jnp.float32,
        ),
        "w_ff1": stack(lambda lp: lp["ff"]["fc1"]["kernel"], dt),
        "w_ff2": stack(lambda lp: lp["ff"]["fc2"]["kernel"], dt),
    }
    V = p["fc"]["kernel"].shape[1]
    fc_w = p["fc"]["kernel"].astype(jnp.float32)
    fc_b = p["fc"]["bias"].astype(jnp.float32)
    packed["fc_w"] = jnp.pad(fc_w, ((0, 0), (0, vpad - V)))
    # padded vocab slots get -1e9 so they can never win downstream argmaxes
    packed["fc_b"] = jnp.pad(fc_b, (0, vpad - V), constant_values=-1e9)
    return packed


def stack_kv_cache(cross_cache: Dict[str, Tuple[jax.Array, jax.Array]], n_layers: int):
    """Per-layer dict of ((B,S,H,hd), (B,S,H,hd)) -> (nl, B, S, 2D) interleaved."""
    rows = []
    for i in range(n_layers):
        k, v = cross_cache[f"layer_{i}"]
        B, S = k.shape[0], k.shape[1]
        rows.append(
            jnp.concatenate([k.reshape(B, S, -1), v.reshape(B, S, -1)], axis=-1)
        )
    return jnp.stack(rows)


def _layernorm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias


def _head_maps(H: int, HD: int):
    """Block-diagonal head indicator matrices (f32).

    Mosaic cannot shape-cast the lane dimension ((rows, H*HD) ->
    (rows, H, HD)), so head-wise reductions/expansions are expressed as
    MXU matmuls against these constants:
      M  (D, H): M[d, h] = [d // HD == h]   — rows @ M sums lanes per head
      MT (H, D): its transpose              — heads @ MT broadcasts per head
    """
    D = H * HD
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    M = (d_ids // HD == h_ids).astype(jnp.float32)
    dt_ids = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1)
    ht_ids = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
    MT = (dt_ids // HD == ht_ids).astype(jnp.float32)
    return M, MT


def _head_sums(prod: jax.Array, M: jax.Array) -> jax.Array:
    """(rows, H*HD) @ (H*HD, H) -> (rows, H): per-head lane sums."""
    return jnp.dot(prod, M, preferred_element_type=jnp.float32)


def _head_expand(x: jax.Array, MT: jax.Array) -> jax.Array:
    """(rows, H) @ (H, D) -> (rows, D): broadcast per-head scalars."""
    return jnp.dot(x, MT, preferred_element_type=jnp.float32)


def _flash_attend(
    q_b,  # (D,) f32 — query for one batch element (all heads)
    kv_hbm_at,  # fn(chunk) -> hbm slice ref for (CHUNK, 2D) interleaved K|V rows
    n_valid,  # scalar int32: number of valid cached rows
    max_chunks: int,
    kvbuf, sems,  # VMEM (2, CHUNK, 2D), DMA sems (2,)
    H: int, HD: int,
    extra_kv=None,  # optional (k_row (D,), v_row (D,)) appended position
):
    """Online-softmax attention of one query against a chunked HBM cache."""
    D = H * HD
    scale = 1.0 / math.sqrt(HD)
    M, MT = _head_maps(H, HD)

    def issue(c, slot):
        @pl.when((c < max_chunks) & (c * CHUNK < n_valid))
        def _():
            pltpu.make_async_copy(kv_hbm_at(c), kvbuf.at[slot], sems.at[slot]).start()

    issue(0, 0)

    def body(c, carry):
        m, l, acc = carry  # (1,H), (1,H), (1,D) f32
        slot = c % 2
        issue(c + 1, (c + 1) % 2)

        @pl.when(c * CHUNK < n_valid)
        def _():
            pltpu.make_async_copy(kv_hbm_at(c), kvbuf.at[slot], sems.at[slot]).wait()

        kvc = kvbuf[slot].astype(jnp.float32)  # (CHUNK, 2D)
        kc = kvc[:, :D]
        vc = kvc[:, D:]
        scores = _head_sums(kc * q_b[None, :], M) * scale  # (CHUNK, H)
        rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, H), 0) + c * CHUNK
        scores = jnp.where(rows < n_valid, scores, -jnp.inf)
        # sanitize V rows never DMA'd: stale buffer bits can be NaN/Inf and
        # 0 * NaN = NaN would poison the (p == 0) masked contributions
        rows_d = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, D), 0) + c * CHUNK
        vc = jnp.where(rows_d < n_valid, vc, 0.0)

        m_c = jnp.max(scores, axis=0, keepdims=True)  # (1, H)
        m_new = jnp.maximum(m, m_c)
        # guard: with no valid rows seen yet m == m_new == -inf and
        # exp(-inf - -inf) = NaN; exponentiate against a finite stand-in
        safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)
        alpha = jnp.exp(m - safe)
        p = jnp.exp(scores - safe)  # (CHUNK, H); exp(-inf)=0 for masked rows
        l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
        p_rep = _head_expand(p, MT)  # (CHUNK, D) head-expanded
        pv = jnp.sum(p_rep * vc, axis=0, keepdims=True)  # (1, D)
        acc_new = acc * _head_expand(alpha, MT) + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((1, H), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((1, H), jnp.float32)
    acc0 = jnp.zeros((1, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, max_chunks, body, (m0, l0, acc0))

    if extra_kv is not None:
        k_row, v_row = extra_kv  # (D,) f32 each
        s = _head_sums((k_row * q_b)[None, :], M) * scale  # (1, H)
        m_new = jnp.maximum(m, s)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)  # (1, H)
        l = l * alpha + p
        acc = acc * _head_expand(alpha, MT) + _head_expand(p, MT) * v_row[None, :]

    return acc / _head_expand(l, MT)  # (1, D)


def _kernel(
    scalars,  # (1 + B,) int32: [index, cross_len...]
    # pipelined weight blocks (leading layer dim of 1)
    x_ref, w_attn, bias, ln, w_ff1, w_ff2, fc_w, fc_b,
    # HBM caches (interleaved K|V lanes)
    self_kv, cross_kv,
    # outputs
    logits_ref, newkv_ref,
    # scratch
    x_s, kvbuf, sems,
    *, B: int, D: int, H: int, L: int, S: int, F: int, n_layers: int,
):
    i = pl.program_id(0)
    HD = D // H
    index = scalars[0]

    @pl.when(i == 0)
    def _():
        x_s[:] = x_ref[:].astype(jnp.float32)

    x = x_s[:]  # (B, D) f32
    dt = w_attn.dtype
    b_all = bias[0, 0]  # (7D + F,) f32

    qkv = (
        jnp.dot(x.astype(dt), w_attn[0][:, : 3 * D], preferred_element_type=jnp.float32)
        + b_all[: 3 * D]
    )  # (B, 3D)
    q = qkv[:, :D]
    k_new = qkv[:, D : 2 * D]
    v_new = qkv[:, 2 * D :]
    newkv_ref[0] = qkv[:, D:].astype(newkv_ref.dtype)  # (B, 2D) interleaved row

    att_rows = []
    for b in range(B):
        att_rows.append(
            _flash_attend(
                q[b],
                lambda c, b=b: self_kv.at[i, b, pl.ds(c * CHUNK, CHUNK), :],
                index,
                L // CHUNK,
                kvbuf, sems, H, HD,
                extra_kv=(k_new[b], v_new[b]),
            )
        )
    att = jnp.concatenate(att_rows, axis=0)  # (B, D) f32
    o = (
        jnp.dot(att.astype(dt), w_attn[0][:, 3 * D : 4 * D], preferred_element_type=jnp.float32)
        + b_all[3 * D : 4 * D]
    )
    x = _layernorm(x + o, ln[0, 0], ln[0, 1])

    qc = (
        jnp.dot(x.astype(dt), w_attn[0][:, 4 * D : 5 * D], preferred_element_type=jnp.float32)
        + b_all[4 * D : 5 * D]
    )
    att_rows = []
    for b in range(B):
        att_rows.append(
            _flash_attend(
                qc[b],
                lambda c, b=b: cross_kv.at[i, b, pl.ds(c * CHUNK, CHUNK), :],
                scalars[1 + b],
                S // CHUNK,
                kvbuf, sems, H, HD,
            )
        )
    att = jnp.concatenate(att_rows, axis=0)
    o = (
        jnp.dot(att.astype(dt), w_attn[0][:, 5 * D : 6 * D], preferred_element_type=jnp.float32)
        + b_all[5 * D : 6 * D]
    )
    x = _layernorm(x + o, ln[0, 2], ln[0, 3])

    h = (
        jnp.dot(x.astype(dt), w_ff1[0], preferred_element_type=jnp.float32)
        + b_all[6 * D : 6 * D + F]
    )
    h = jnp.maximum(h, 0.0)
    y = (
        jnp.dot(h.astype(dt), w_ff2[0], preferred_element_type=jnp.float32)
        + b_all[6 * D + F : 6 * D + F + D]
    )
    x = _layernorm(x + y, ln[0, 4], ln[0, 5])
    x_s[:] = x

    @pl.when(i == n_layers - 1)
    def _():
        logits_ref[:] = jnp.dot(x, fc_w[:], preferred_element_type=jnp.float32) + fc_b[:]


@functools.partial(
    jax.jit,
    static_argnames=("n_layers", "d_model", "nhead", "d_ff", "vpad", "interpret"),
)
def fused_decode_step(
    packed: Dict[str, jax.Array],
    x_emb: jax.Array,  # (B, D) compute-dtype embedded token (+PE)
    self_kv: jax.Array,  # (n_layers, B, L, 2D) interleaved K|V
    cross_kv: jax.Array,  # (n_layers, B, S, 2D)
    index: jax.Array,  # scalar int32: #cached self rows (= position)
    cross_len: jax.Array,  # (B,) int32 valid memory rows
    *,
    n_layers: int,
    d_model: int,
    nhead: int,
    d_ff: int,
    vpad: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (logits (B, vpad) f32, new_kv (n_layers, B, 2D))."""
    B = x_emb.shape[0]
    L = self_kv.shape[2]
    S = cross_kv.shape[2]
    D = d_model
    F = d_ff
    assert L % CHUNK == 0 and S % CHUNK == 0, (L, S)
    dt = self_kv.dtype

    scalars = jnp.concatenate(
        [jnp.asarray(index, jnp.int32)[None], cross_len.astype(jnp.int32)]
    )

    def layer_block(shape, buffers=2):
        return pl.BlockSpec(
            (1, *shape),
            lambda i, *_refs: (i, *([0] * len(shape))),
            pipeline_mode=pl.Buffered(buffer_count=buffers),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_layers,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x_emb
            layer_block((D, 6 * D)),  # w_attn
            layer_block((1, 7 * D + F)),  # bias strip
            layer_block((6, D)),  # ln
            layer_block((D, F), buffers=1),  # w_ff1 (single-buffered: VMEM)
            layer_block((F, D), buffers=1),  # w_ff2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fc_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fc_b
            pl.BlockSpec(memory_space=pl.ANY),  # self_kv
            pl.BlockSpec(memory_space=pl.ANY),  # cross_kv
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # logits
            pl.BlockSpec((1, B, 2 * D), lambda i, *_refs: (i, 0, 0)),  # new_kv
        ],
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),  # x_s
            pltpu.VMEM((2, CHUNK, 2 * D), dt),  # kvbuf
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _kernel, B=B, D=D, H=nhead, L=L, S=S, F=F, n_layers=n_layers
    )
    logits, new_kv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, vpad), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, B, 2 * D), dt),
        ),
        interpret=interpret,
    )(
        scalars,
        x_emb,
        packed["w_attn"], packed["bias"], packed["ln"],
        packed["w_ff1"], packed["w_ff2"],
        packed["fc_w"], packed["fc_b"],
        self_kv, cross_kv,
    )
    return logits, new_kv


def vocab_pad(vocab_size: int) -> int:
    return _round_up(vocab_size, 128)
