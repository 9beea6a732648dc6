"""Jitted batched KV-cache infill decode loop.

The reference re-runs the FULL encoder + decoder prefix for every emitted
token and resamples rejected tokens on the host (``generation.py:209-225,
528-652``) — for an infill of M spans x T tokens that is M*T transformer
forwards.  Here the entire infill session is ONE compiled XLA program:

* encoder runs once; per-layer cross K/V are projected once;
* a ``lax.while_loop`` steps the decoder with O(1) new work per token
  against a preallocated self-attention cache;
* grammar constraints are dense mask lookups (``infer/grammar.py``) and
  sampling is masked nucleus/temperature (``infer/sampling.py``);
* span boundaries are handled in-loop: on <eos> / span cap the next ``m_0``
  is forced and the per-element span index advances; control-slot spans
  (density/occupation/polyphony/tensile) emit exactly their one control
  token.  Everything is batched — elements can be in different spans.

Output follows the reference's decoder-stream convention: concatenated
spans, each introduced by ``m_0``, with no <eos> tokens (the reference
drops them via ``this_tgt_inp[:-1]``), ready for ``restore_marked_input``.
"""

from __future__ import annotations

import math
import warnings

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import ScoreTransformer, sinusoidal_table
from ..ops.decode_step import (
    CHUNK,
    ST_DONE,
    ST_LEN,
    ST_TOKEN,
    fused_decode_step,
    fused_decode_token,
    fused_verify_window,
    pack_decoder_weights,
    pack_sampling_tables,
    stack_kv_cache,
    vocab_pad,
)
from ..vocab import WordVocab
from .grammar import (
    N_SID,
    SPAN_BODY,
    GrammarTables,
    allowed_mask_fast,
    build_fast_tables,
    update_bits,
)
from .sampling import greedy_sample, masked_sample_gumbel, spec_accept_resample


class DecodeResult(NamedTuple):
    tokens: jax.Array  # (B, max_tgt) int32, pad 0
    lengths: jax.Array  # (B,) int32 valid length per element
    steps: jax.Array  # scalar int32: loop iterations executed


@dataclass(eq=False)  # identity hash: the instance is a static jit argument
class InfillDecoder:
    """Compiled infill decoder bound to one model + vocab."""

    model: ScoreTransformer
    vocab: WordVocab
    max_tgt_len: int = 1024
    max_spans: int = 256  # 16 bars x 3 tracks x (body + 3 controls + tensile)
    span_cap: int = 100  # tokens per span incl. the introducing m_0
    nucleus_p: Optional[float] = 0.9
    temperature: float = 1.0
    greedy: bool = False
    # Fused pallas decoder-step kernel (ops/decode_step.py).  None = auto
    # (on for TPU backends when the model shape fits the kernel contract).
    fused: Optional[bool] = None
    # v3: also fuse embedding + grammar-masked sampling + span bookkeeping
    # into the kernel (the XLA loop body shrinks to ~4 ops).  None = follow
    # ``fused``.
    fused_sampling: Optional[bool] = None
    # "int8": stream symmetric per-column int8 decoder weights through the
    # fused kernel (f32 scales applied to matmul outputs) — halves the
    # per-token HBM weight traffic, the dominant B=1 decode cost.  Logits
    # differ from the bf16 path by the quantization error (~0.5% relative);
    # grammar legality is unaffected (masks are exact).  Requires ``fused``.
    quant: str = "none"
    # >1: decode this many tokens per pallas program ("kernel looping",
    # grid (T_chunk, n_layers) with the KV cache appended in-kernel) —
    # amortizes per-token kernel-launch + XLA loop-op overhead.  Requires
    # the fused-sampling path; token-exact with token_chunk=1.
    token_chunk: int = 1
    # >0: speculative decode (XLA cache path, B=1 only) — draft this many
    # tokens per iteration by prompt-lookup (most recent bigram match in
    # the emitted stream, falling back to the source window), verify all
    # of them in ONE multi-position forward (decode_window), and emit the
    # accepted prefix + one corrective/bonus token.  The B=1 step is
    # HBM-weight-bound, so a W-token verify costs about one step: any
    # accepted token is nearly free.  Greedy: bit-identical output to the
    # baseline.  Nucleus: distribution-identical via delta-draft
    # speculative sampling (sampling.spec_accept_resample) — a different
    # lateral RNG stream than the baseline, so streams differ token-wise
    # but not in law.  Measured acceptance on r6 flagship streams:
    # ~2.4 emitted/verify greedy, ~1.4 nucleus (k=8, bigram).
    draft_k: int = 0
    interpret: bool = False  # run the fused kernel interpreted (CPU tests)
    # Multi-chip serving: shard_map the fused loop over the mesh's dp axis
    # (each chip decodes its local batch slice with the pallas kernel).
    # The per-SHARD batch must satisfy the kernel's B gate; run_batch pads
    # to dp/4dp/8dp group sizes accordingly.
    mesh: Optional[object] = None

    def __post_init__(self):
        self.tables = GrammarTables.build(self.vocab)
        self.fast_tables = build_fast_tables(self.tables)
        self.sampling_tables = pack_sampling_tables(
            self.vocab, self.tables, self.fast_tables,
            vocab_pad(self.tables.vocab_size),
        )
        cfg = self.model.cfg
        if self.max_tgt_len > cfg.max_len:
            # past max_len the XLA paths' pos_table gather clamps (silently
            # reusing the last PE row) while the fused kernel computes PE
            # analytically — the paths would diverge instead of erroring
            raise ValueError(
                f"max_tgt_len={self.max_tgt_len} exceeds the model's "
                f"positional limit max_len={cfg.max_len}"
            )
        self._kernel_fits = (
            cfg.d_model % 128 == 0
            and cfg.d_model // cfg.nhead in (64, 128)
            and self.max_tgt_len % CHUNK == 0
        )
        if self.fused and not self._kernel_fits:
            raise ValueError(
                f"fused decode needs d_model%128==0 and max_tgt_len%{CHUNK}==0"
            )
        if self.draft_k > 0 and self.quant != "none":
            raise ValueError(
                "speculative decode (draft_k > 0) runs the XLA cache path "
                "and cannot stream quantized weights; drop one of the two"
            )
        if self.fused is not None:
            # explicit choice: validate dependent flags eagerly (still no
            # device touch).  fused=None ('auto') defers to the first call
            # — construction must never initialize the backend (the round-4
            # driver bench died on a FailedPrecondition raised here).
            self.resolve_backend()
        # one wrapper serves both call shapes: jax.jit caches per
        # signature, so forced and unforced calls compile separately anyway
        self._decode_jit = jax.jit(self._decode, static_argnames=("self",))

    def resolve_backend(self) -> None:
        """Resolve ``fused=None`` ('auto') against the live backend.

        Deferred from ``__post_init__`` so that CONSTRUCTING a decoder
        never initializes (or talks to) the device backend — the tables
        are all host numpy and the jit wrapper is lazy, so an engine can
        be built while the chip is busy, tunnelled-out, or absent.
        Runs (and mutates flags) only before the first trace is cached:
        ``self`` is a static jit argument hashed by identity, so any
        flag change after a compile would be silently ignored — every
        decode entry point calls this first.
        """
        if self.fused is None:
            self.fused = (
                jax.default_backend() == "tpu" and self._kernel_fits
            )
        if self.fused_sampling is None:
            self.fused_sampling = self.fused
        if self.quant != "none" and not self.fused:
            raise ValueError("quantized decode requires the fused kernel path")
        if self.token_chunk > 1 and not (self.fused and self.fused_sampling):
            raise ValueError(
                "token_chunk > 1 (kernel looping) requires the fused-sampling "
                "kernel path"
            )

    # -- public API -----------------------------------------------------
    def __call__(
        self,
        params,
        src: np.ndarray,  # (B, S) int32, 0-padded
        span_types: np.ndarray,  # (B, max_spans) int32 span codes
        n_spans: np.ndarray,  # (B,) int32
        no_whole_duration: bool,
        rng: jax.Array,
        forced: Optional[np.ndarray] = None,  # (B, L) decoder-stream prefix
        forced_len: Optional[np.ndarray] = None,  # (B,) prefix lengths
    ) -> DecodeResult:
        """``forced``/``forced_len``: teacher-force the first ``forced_len``
        decoder-stream positions (the reference's in-decode
        ``use_correct_control`` substitution, ``evaluation.py:1217-1288``,
        resumes a session after the host rewrites a control token).  The
        prefix uses the output-stream convention (``m_0`` span markers, no
        <eos>); sampling takes over at ``forced_len``.  XLA path only."""
        self.resolve_backend()
        src = jnp.asarray(src, dtype=jnp.int32)
        span_types = jnp.asarray(span_types, dtype=jnp.int32)
        n_spans = jnp.asarray(n_spans, dtype=jnp.int32)
        if forced is not None:
            if self.fused:
                raise ValueError(
                    "forced-prefix decode requires the XLA path; build the "
                    "decoder with fused=False"
                )
            B = src.shape[0]
            f = np.zeros((B, self.max_tgt_len), np.int32)
            fl = np.asarray(forced_len, np.int32)
            forced = np.asarray(forced, np.int32)
            f[:, : forced.shape[1]] = forced[:, : self.max_tgt_len]
            return self._decode_jit(
                self, params, src, span_types, n_spans,
                jnp.asarray(no_whole_duration), rng,
                jnp.asarray(f), jnp.asarray(fl),
            )
        return self._decode_jit(
            self, params, src, span_types, n_spans,
            jnp.asarray(no_whole_duration), rng,
        )

    # -- the compiled program -------------------------------------------
    @staticmethod
    def _decode(self, params, src, span_types, n_spans, no_whole, rng,
                forced=None, forced_len=None) -> DecodeResult:
        model, t = self.model, self.tables
        B = src.shape[0]
        L = self.max_tgt_len

        src_pad = src == 0
        memory = model.apply(params, src, src_pad, method=ScoreTransformer.encode)
        cross = model.apply(params, memory, method=ScoreTransformer.init_cross_cache)

        cfg = model.cfg
        S = src.shape[1]
        # B gate: the kernel attends per batch element sequentially; the
        # shared per-token weight stream amortizes with B (v5e aggregate:
        # B=1 15.5k, B=4 35k, B=8 43.6k tok/s vs 14k for the XLA path at
        # any batch), but per-element instruction count grows linearly —
        # beyond 8 the engine chunks requests instead (engine.run_batch).
        # B must also be lane-tileable: the kernel's (L, B, vpad) noise
        # buffer is sliced per token and Mosaic requires the sliced batch
        # dim to align to its (4, 128) tiling — B == 1 or a multiple of 4
        # (B=3 fails to compile: "Slice shape along dimension 1 must be
        # aligned to tiling (4)").  engine.run_batch pads request groups
        # to these sizes; a direct caller with an odd B falls back to the
        # XLA step path instead of a compile error.
        # Under a dp mesh the kernel runs per shard: gate on the LOCAL batch
        dp = 1 if self.mesh is None else int(self.mesh.shape["dp"])
        B_loc, B_even = (B // dp, B % dp == 0) if dp > 1 else (B, True)
        use_fused = (
            self.fused and S % CHUNK == 0 and S <= cfg.max_len and B_even
            and B_loc <= 8 and (B_loc == 1 or B_loc % 4 == 0)
        )
        if self.quant != "none" and not use_fused:
            # trace-time (shapes are static): the constructor guaranteed
            # quant implies fused, but this call's shape fell off the
            # kernel contract — the caller would silently get bf16 weights.
            warnings.warn(
                f"quant={self.quant!r} configured but this call (B={B}, S={S}) "
                "is ineligible for the fused kernel; decoding unquantized via "
                "the XLA path. Pad B to 1 or a multiple of 4 (<=8) and S to a "
                f"multiple of {CHUNK} (<= max_len) to quantize.",
                stacklevel=2,
            )
        # spec decode preempts the fused kernel at B=1: the whole point is
        # the A/B against it (PERFORMANCE.md); batched or forced-prefix
        # calls fall through to the existing paths
        if self.draft_k > 0 and B == 1 and forced is None:
            return InfillDecoder._decode_v5(
                self, params, src, src_pad, memory, cross, span_types,
                n_spans, no_whole, rng,
            )
        if use_fused:
            nl, D = cfg.num_decoder_layers, cfg.d_model
            vpad = vocab_pad(t.vocab_size)
            packed = pack_decoder_weights(params, cfg, vpad, quant=self.quant)
            cross_kv = stack_kv_cache(cross, nl)
            cross_len = jnp.sum(~src_pad, axis=1).astype(jnp.int32)
            if self.fused_sampling:
                if self.mesh is not None and dp > 1:
                    if self.token_chunk > 1:
                        warnings.warn(
                            "token_chunk > 1 (kernel looping) is not "
                            "implemented for the dp-sharded fused path; "
                            "decoding with single-token steps",
                            stacklevel=2,
                        )
                    return InfillDecoder._decode_v3_sharded(
                        self, t, cfg, packed, cross_kv, cross_len,
                        span_types, n_spans, no_whole, rng, B, L,
                    )
                if self.token_chunk > 1:
                    return InfillDecoder._decode_v4(
                        self, t, cfg, packed, cross_kv, cross_len,
                        span_types, n_spans, no_whole, rng, B, L,
                    )
                return InfillDecoder._decode_v3(
                    self, t, cfg, packed, cross_kv, cross_len,
                    span_types, n_spans, no_whole, rng, B, L,
                )
            emb_table = params["params"]["embedding"]["embedding"]
            pos_table = sinusoidal_table(cfg.max_len, D)
            cache = jnp.zeros((nl, B, L, 2 * D), cfg.dtype)
        else:
            cache = model.apply(params, B, L, method=ScoreTransformer.init_self_cache)

        state_masks, sid_from_bits, next_bits = self.fast_tables
        # All sampling noise for the session, generated in ONE parallel op so
        # the loop body carries no serial threefry chain (see sampling.py).
        noise = jax.random.gumbel(rng, (L, B, t.vocab_size), dtype=jnp.float32)
        out = jnp.zeros((B, L), dtype=jnp.int32).at[:, 0].set(t.mask_index)
        state = jnp.zeros((B,), jnp.int32)  # packed grammar bits
        steps_in_span = jnp.ones((B,), jnp.int32)
        span_idx = jnp.zeros((B,), jnp.int32)
        done = n_spans <= 0
        lengths = jnp.ones((B,), jnp.int32)

        def cond(carry):
            pos, done, *_ = carry
            return (pos + 1 < L) & jnp.any(~done)

        def body(carry):
            pos, done, out, cache, state, steps_in_span, span_idx, lengths = carry
            token = out[:, pos]
            if use_fused:
                x = (
                    emb_table[token] * math.sqrt(cfg.d_model)
                    + pos_table[pos]
                ).astype(cfg.dtype)
                logits, new_kv = fused_decode_step(
                    packed, x, cache, cross_kv, pos, cross_len,
                    n_layers=cfg.num_decoder_layers, d_model=cfg.d_model,
                    nhead=cfg.nhead, d_ff=cfg.d_ff,
                    vpad=vocab_pad(t.vocab_size), interpret=self.interpret,
                )
                logits = logits[:, : t.vocab_size]
                cache = jax.lax.dynamic_update_slice(
                    cache, new_kv[:, :, None, :], (0, 0, pos, 0)
                )
            else:
                logits, cache = model.apply(
                    params, token, pos, cache, cross, src_pad,
                    method=ScoreTransformer.decode_step,
                )

            cur_type = span_types[jnp.arange(B), jnp.minimum(span_idx, self.max_spans - 1)]
            is_start = steps_in_span == 1
            allowed = allowed_mask_fast(
                state_masks, sid_from_bits, state, is_start, cur_type, no_whole,
                start_overrides=(t.mode == 1),
            )

            if self.greedy:
                sampled = greedy_sample(logits, allowed)
            else:
                g = jax.lax.dynamic_index_in_dim(noise, pos, axis=0, keepdims=False)
                sampled = masked_sample_gumbel(
                    g, logits, allowed, self.nucleus_p, self.temperature
                )

            control_done = (cur_type != SPAN_BODY) & (steps_in_span >= 2)
            # cap parity (reference generation.py:542 `len(this_tgt_inp) <
            # 100` with the introducing m_0 counted): a span may reach
            # span_cap tokens incl. m_0, i.e. end when steps (tokens so
            # far) has hit the cap, not one short of it
            end_span = (
                (sampled == t.eos_index)
                | (steps_in_span >= self.span_cap)
                | control_done
            )
            if forced is not None:
                # teacher-force the prefix: within it the "sampled" token is
                # the forced one, and a forced m_0 marks the span boundary
                # (the output stream drops <eos>, so m_0 IS the end signal)
                f_next = jax.lax.dynamic_slice_in_dim(
                    forced, pos + 1, 1, axis=1
                )[:, 0]
                in_force = (pos + 1) < forced_len
                forced_end = in_force & (f_next == t.mask_index)
                sampled = jnp.where(in_force & ~forced_end, f_next, sampled)
                end_span = jnp.where(in_force, forced_end, end_span)
            new_span_idx = jnp.where(end_span, span_idx + 1, span_idx)
            now_done = done | (new_span_idx >= n_spans)

            next_tok = jnp.where(end_span, t.mask_index, sampled)
            next_tok = jnp.where(now_done, 0, next_tok)  # now_done covers done

            new_state = update_bits(next_bits, state, sampled)
            reset = end_span | done
            new_state = jnp.where(reset, 0, new_state)
            new_steps = jnp.where(end_span, 1, steps_in_span + 1)

            out = out.at[:, pos + 1].set(next_tok)
            lengths = jnp.where(next_tok != 0, pos + 2, lengths)
            return (pos + 1, now_done, out, cache, new_state, new_steps,
                    new_span_idx, lengths)

        pos0 = jnp.int32(0)
        carry = (pos0, done, out, cache, state, steps_in_span, span_idx, lengths)
        pos, done, out, cache, state, steps_in_span, span_idx, lengths = (
            jax.lax.while_loop(cond, body, carry)
        )
        return DecodeResult(tokens=out, lengths=lengths, steps=pos)

    @staticmethod
    def _decode_v5(self, params, src, src_pad, memory, cross, span_types,
                   n_spans, no_whole, rng) -> DecodeResult:
        """Speculative (draft-and-verify) decode — XLA cache path, B=1.

        Per loop iteration: (1) draft K tokens by prompt-lookup — the
        continuation of the most recent bigram match in the emitted
        stream, else the last match in the source window (music is
        repetitive: measured ~2.4 emitted/verify greedy, ~1.4 nucleus on
        r6 flagship streams); (2) score the current token + all K drafts
        in one ``decode_window`` forward — at B=1 the step streams the
        full decoder weights from HBM either way, so the K+1-row verify
        costs about one baseline step; (3) a K+1-slot scan replays the
        exact per-token bookkeeping of the baseline body (grammar bits,
        span caps, control slots, <eos> -> ``m_0``) and emits the
        accepted prefix plus one corrective/bonus token.  Slot i's logits
        are valid iff every earlier emitted token equals the window input
        the verify assumed — the chain breaks at the first divergence,
        exactly the speculative-decoding contract.

        Greedy output is bit-identical to the baseline loop (same argmax
        chain).  Nucleus sampling is distribution-identical via
        delta-draft speculative sampling; each absolute position consumes
        its own pre-generated noise row exactly once, so no draw is ever
        reused across retries.  The windowed loop stops ``K`` positions
        before the buffer cap (the verify window must fit); a
        single-token tail loop then decodes the remaining < K+1
        positions, so cap-hitting sessions fill the buffer exactly like
        the baseline decoder (ADVICE r4).
        """
        model, t = self.model, self.tables
        L = self.max_tgt_len
        K = self.draft_k
        W = K + 1
        V = t.vocab_size
        cfg = model.cfg

        # verify backend: the v6 pallas kernel when the shape fits (one
        # weight stream + one KV-chunk DMA pass shared by all W rows —
        # Finding 9's surviving lever), else the XLA decode_window
        S_in = src.shape[1]
        use_kernel = (
            cfg.d_model % 128 == 0
            and cfg.d_model // cfg.nhead in (64, 128)
            and L % CHUNK == 0 and S_in % CHUNK == 0 and S_in <= cfg.max_len
            and (
                self.interpret  # CPU tests exercise the kernel explicitly
                or (jax.default_backend() == "tpu" and self.fused is not False)
            )
        )
        if use_kernel:
            nl, D = cfg.num_decoder_layers, cfg.d_model
            vpad = vocab_pad(t.vocab_size)
            packed = pack_decoder_weights(params, cfg, vpad)
            cross_kv = stack_kv_cache(cross, nl)
            cross_len = jnp.sum(~src_pad, axis=1).astype(jnp.int32)
            emb_table = params["params"]["embedding"]["embedding"]
            pos_table = sinusoidal_table(cfg.max_len, D)
            cache = jnp.zeros((nl, 1, L, 2 * D), cfg.dtype)

            def verify(window, pos, cache):
                x = (
                    emb_table[window] * math.sqrt(D)
                    + jax.lax.dynamic_slice_in_dim(pos_table, pos, W, axis=0)
                ).astype(cfg.dtype)
                lg, new_kv = fused_verify_window(
                    packed, x, cache, cross_kv, pos, cross_len,
                    n_layers=nl, d_model=D, nhead=cfg.nhead, d_ff=cfg.d_ff,
                    vpad=vpad, interpret=self.interpret,
                )
                cache = jax.lax.dynamic_update_slice(
                    cache, new_kv[:, None, :, :], (0, 0, pos, 0)
                )
                return lg[:, :V], cache
        else:
            cache = model.apply(
                params, 1, L, method=ScoreTransformer.init_self_cache
            )

            def verify(window, pos, cache):
                lg, cache = model.apply(
                    params, window[None], pos, cache, cross, src_pad,
                    method=ScoreTransformer.decode_window,
                )
                return lg[0], cache
        state_masks, sid_from_bits, next_bits = self.fast_tables

        g_rng, u_rng = jax.random.split(rng)
        noise = jax.random.gumbel(g_rng, (L, V), dtype=jnp.float32)
        uniforms = jax.random.uniform(u_rng, (L,), dtype=jnp.float32)

        src_row = src[0]
        S = src_row.shape[0]
        jj_src = jnp.arange(S)
        src_shift = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), src_row[:-1]]
        )
        jj_out = jnp.arange(L)

        def build_draft(out_row, pos):
            """Prompt-lookup: continuation of the latest bigram match."""
            key0 = out_row[jnp.maximum(pos - 1, 0)]
            key1 = out_row[pos]
            out_shift = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), out_row[:-1]]
            )
            m_out = (
                (out_shift == key0) & (out_row == key1)
                & (jj_out >= 1) & (jj_out <= pos - 1)
            )
            j_out = jnp.max(jnp.where(m_out, jj_out, -1))
            m_src = (
                (src_shift == key0) & (src_row == key1)
                & (jj_src >= 1) & (src_row != 0)
            )
            j_src = jnp.max(jnp.where(m_src, jj_src, -1))
            d_out = jax.lax.dynamic_slice(
                out_row, (jnp.clip(j_out + 1, 0, L - K),), (K,)
            )
            d_src = jax.lax.dynamic_slice(
                src_row, (jnp.clip(j_src + 1, 0, S - K),), (K,)
            )
            # token 0 never matches grammar output -> graceful no-draft
            return jnp.where(
                j_out >= 0, d_out,
                jnp.where(j_src >= 0, d_src, jnp.zeros((K,), jnp.int32)),
            )

        def cond(carry):
            pos, done, *_ = carry
            return (pos + 1 + K < L) & jnp.any(~done)

        W_iota = jnp.arange(W)

        def body(carry):
            pos, done, out, cache, state, steps, span, lengths = carry
            out_row = out[0]
            draft = build_draft(out_row, pos)
            window = jnp.concatenate([out_row[pos][None], draft])  # (W,)
            logits_w, cache = verify(window, pos, cache)  # (W, V)
            g_rows = jax.lax.dynamic_slice(noise, (pos, 0), (W, V))
            u_rows = jax.lax.dynamic_slice(uniforms, (pos,), (W,))

            # ---- assumed-emission state chain: a LIGHT scan over the K
            # draft slots (table lookups only).  Slot i samples with the
            # grammar/span state reached if slots < i emitted exactly the
            # window inputs — the same condition under which slot i's
            # logits are valid, so any slot whose pre-state is wrong is
            # discarded by the prefix mask below anyway.  Given an emitted
            # token w the update is deterministic: w == m_0 iff an
            # end_span fired (m_0 is never a sampleable token), which
            # resets the state; otherwise sampled == w and the bits
            # advance.  Keeping the samplers OUT of this scan is the
            # round-4 restructure: the heavy ops (mask gather, softmax,
            # nucleus filter, argmax) run ONCE batched over all W slots
            # instead of 9x sequentially (Finding 9).
            def chain(c, w):
                st, c_steps, c_span = c
                ended = w == t.mask_index
                st2 = jnp.where(
                    ended, 0, update_bits(next_bits, st[None], w[None])[0]
                )
                steps2 = jnp.where(ended, 1, c_steps + 1)
                span2 = jnp.where(ended, c_span + 1, c_span)
                return (st2, steps2, span2), (st2, steps2, span2)

            _, (st_seq, steps_seq, span_seq) = jax.lax.scan(
                chain, (state, steps, span), draft
            )
            states = jnp.concatenate([state[None], st_seq])      # (W,)
            steps_w = jnp.concatenate([steps[None], steps_seq])  # (W,)
            spans_w = jnp.concatenate([span[None], span_seq])    # (W,)

            # ---- one batched sampling pass over all W slots
            cur_type = span_types[0, jnp.minimum(spans_w, self.max_spans - 1)]
            allowed = allowed_mask_fast(
                state_masks, sid_from_bits, states, steps_w == 1, cur_type,
                no_whole, start_overrides=(t.mode == 1),
            )  # (W, V)
            if self.greedy:
                sampled = greedy_sample(logits_w, allowed)  # (W,)
            else:
                proposals = jnp.concatenate(
                    [jnp.maximum(draft, 0), jnp.zeros((1,), jnp.int32)]
                )
                spec_tok, _ = spec_accept_resample(
                    u_rows, g_rows, logits_w, allowed, proposals,
                    self.nucleus_p, self.temperature,
                )
                plain_tok = masked_sample_gumbel(
                    g_rows, logits_w, allowed, self.nucleus_p,
                    self.temperature,
                )
                # slot K has no draft: plain sample (the "bonus" token)
                sampled = jnp.where(W_iota == K, plain_tok, spec_tok)

            # ---- vectorized per-slot baseline bookkeeping
            control_done = (cur_type != SPAN_BODY) & (steps_w >= 2)
            end_span = (
                (sampled == t.eos_index)
                | (steps_w >= self.span_cap)
                | control_done
            )
            new_span = jnp.where(end_span, spans_w + 1, spans_w)
            now_done = new_span >= n_spans[0]
            next_tok = jnp.where(end_span, t.mask_index, sampled)
            next_tok = jnp.where(now_done, 0, next_tok)

            # accepted prefix: slot i emits iff every earlier slot emitted
            # its assumed window input and did not finish the session
            match = jnp.concatenate(
                [next_tok[:K] == draft, jnp.zeros((1,), bool)]
            )
            keep = (match & ~now_done).astype(jnp.int32)
            prefix_ok = jnp.concatenate(
                [jnp.ones((1,), jnp.int32), jnp.cumprod(keep)[:K]]
            ).astype(bool)
            emit = prefix_ok  # cond guarantees ~done at entry
            m = jnp.sum(emit.astype(jnp.int32))  # emitted this iteration

            e = jnp.where(emit, next_tok, 0)
            # single W-row write; non-emitted slots write 0 over positions
            # that are 0 by construction (never yet emitted)
            out = jax.lax.dynamic_update_slice(out, e[None], (0, pos + 1))
            cand = jnp.where(emit & (next_tok != 0), pos + W_iota + 2, 0)
            lengths = jnp.maximum(lengths, jnp.max(cand))

            # post-state of the LAST emitted slot becomes the carry
            st_post = jnp.where(
                end_span, 0, update_bits(next_bits, states, sampled)
            )
            steps_post = jnp.where(end_span, 1, steps_w + 1)
            last = jnp.maximum(m - 1, 0)
            return (
                pos + m, done | now_done[last], out, cache,
                st_post[last], steps_post[last], new_span[last], lengths,
            )

        out = jnp.zeros((1, L), dtype=jnp.int32).at[:, 0].set(t.mask_index)
        carry = (
            jnp.int32(0), n_spans[0] <= 0, out, cache, jnp.int32(0),
            jnp.int32(1), jnp.int32(0), jnp.int32(1),
        )
        carry = jax.lax.while_loop(cond, body, carry)

        # ---- single-token tail: the windowed cond leaves up to K
        # positions before the cap undecoded; finish them one at a time
        # (a W=1 verify is exactly a cached decode step) so a cap-hitting
        # session matches the baseline's buffer fill (ADVICE r4)
        def tail_cond(carry):
            pos, done, *_ = carry
            return (pos + 1 < L) & ~done

        def tail_body(carry):
            pos, done, out, cache, state, steps, span, lengths = carry
            logits1, cache = verify(out[0, pos][None], pos, cache)  # (1, V)
            cur_type = span_types[0, jnp.minimum(span, self.max_spans - 1)]
            allowed = allowed_mask_fast(
                state_masks, sid_from_bits, state[None], (steps == 1)[None],
                cur_type[None], no_whole, start_overrides=(t.mode == 1),
            )
            if self.greedy:
                sampled = greedy_sample(logits1, allowed)[0]
            else:
                g = jax.lax.dynamic_slice(noise, (pos, 0), (1, V))
                sampled = masked_sample_gumbel(
                    g, logits1, allowed, self.nucleus_p, self.temperature
                )[0]
            control_done = (cur_type != SPAN_BODY) & (steps >= 2)
            end_span = (
                (sampled == t.eos_index)
                | (steps >= self.span_cap)
                | control_done
            )
            new_span = jnp.where(end_span, span + 1, span)
            now_done = new_span >= n_spans[0]
            next_tok = jnp.where(end_span, t.mask_index, sampled)
            next_tok = jnp.where(now_done, 0, next_tok)
            out = out.at[0, pos + 1].set(next_tok)
            lengths = jnp.where(next_tok != 0, pos + 2, lengths)
            new_state = jnp.where(
                end_span, 0, update_bits(next_bits, state[None], sampled[None])[0]
            )
            new_steps = jnp.where(end_span, 1, steps + 1)
            return (pos + 1, done | now_done, out, cache, new_state,
                    new_steps, new_span, lengths)

        pos, done, out, cache, state, steps, span, lengths = (
            jax.lax.while_loop(tail_cond, tail_body, carry)
        )
        return DecodeResult(
            tokens=out, lengths=lengths[None], steps=pos
        )

    def _v3_state0(self, t, n_spans, no_whole, B):
        state0 = jnp.stack(
            [
                jnp.full((B,), t.mask_index, jnp.int32),  # ST_TOKEN
                jnp.zeros((B,), jnp.int32),  # ST_BITS
                jnp.ones((B,), jnp.int32),  # ST_STEPS
                jnp.zeros((B,), jnp.int32),  # ST_SPAN
                (n_spans <= 0).astype(jnp.int32),  # ST_DONE
                jnp.ones((B,), jnp.int32),  # ST_LEN
            ]
        )
        aux = jnp.stack(
            [
                n_spans.astype(jnp.int32),
                jnp.broadcast_to(jnp.asarray(no_whole), (B,)).astype(jnp.int32),
            ]
        )
        return state0, aux

    def _v3_loop(
        self, t, cfg, packed, state0, aux, span_types, noise, cache,
        cross_kv, cross_len, L,
    ):
        """The fully-fused token loop (one pallas call + 3 XLA ops per
        token).  Pure array-in/array-out so it can run directly or inside
        a ``shard_map`` shard (multi-chip serving, SURVEY §2.5)."""
        vpad = vocab_pad(t.vocab_size)
        B = span_types.shape[0]

        def cond(carry):
            pos, state, out, cache = carry
            return (pos + 1 < L) & jnp.any(state[ST_DONE] == 0)

        def body(carry):
            pos, state, out, cache = carry
            new_state, new_kv = fused_decode_token(
                packed, self.sampling_tables, state, aux, span_types, noise,
                cache, cross_kv, pos, cross_len,
                n_layers=cfg.num_decoder_layers, d_model=cfg.d_model,
                nhead=cfg.nhead, d_ff=cfg.d_ff, vpad=vpad, mode=t.mode,
                max_spans=self.max_spans, span_cap=self.span_cap,
                eos_index=t.eos_index, mask_index=t.mask_index,
                nucleus_p=self.nucleus_p, temperature=self.temperature,
                greedy=self.greedy, n_sid=N_SID, span_body=SPAN_BODY,
                interpret=self.interpret,
            )
            out = out.at[:, pos + 1].set(new_state[ST_TOKEN])
            cache = jax.lax.dynamic_update_slice(
                cache, new_kv[:, :, None, :], (0, 0, pos, 0)
            )
            return pos + 1, new_state, out, cache

        out = jnp.zeros((B, L), jnp.int32).at[:, 0].set(t.mask_index)
        carry = (jnp.int32(0), state0, out, cache)
        pos, state, out, cache = jax.lax.while_loop(cond, body, carry)
        return out, state[ST_LEN], jnp.broadcast_to(pos, (B,))

    @staticmethod
    def _decode_v3(
        self, t, cfg, packed, cross_kv, cross_len, span_types, n_spans,
        no_whole, rng, B, L,
    ) -> DecodeResult:
        """Fully-fused loop: one pallas call + 3 XLA ops per token."""
        vpad = vocab_pad(t.vocab_size)
        if self.greedy:
            noise = jnp.zeros((1, B, vpad), jnp.float32)
        else:
            noise = jax.random.gumbel(rng, (L, B, vpad), dtype=jnp.float32)
        state0, aux = self._v3_state0(t, n_spans, no_whole, B)
        cache = jnp.zeros(
            (cfg.num_decoder_layers, B, L, 2 * cfg.d_model), cfg.dtype
        )
        out, lengths, steps_b = self._v3_loop(
            t, cfg, packed, state0, aux, span_types, noise, cache,
            cross_kv, cross_len, L,
        )
        return DecodeResult(tokens=out, lengths=lengths, steps=steps_b[0])

    @staticmethod
    def _decode_v3_sharded(
        self, t, cfg, packed, cross_kv, cross_len, span_types, n_spans,
        no_whole, rng, B, L,
    ) -> DecodeResult:
        """The fused loop shard_mapped over the mesh ``dp`` axis.

        Each shard runs the pallas kernel on its local batch slice — the
        session has no cross-element dependencies, so the only difference
        from the single-chip path is placement: N chips sustain N x the
        fused aggregate throughput (VERDICT r1 weak #2: the mesh path
        previously fell back to the ~3x-slower XLA decode).  Per-element
        results are bit-identical to the unsharded kernel given the same
        rng: the gumbel noise is generated once at global batch and
        sharded, so element b sees the same noise rows either way.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        mesh = self.mesh
        dp = mesh.shape["dp"]
        vpad = vocab_pad(t.vocab_size)
        if self.greedy:
            noise = jnp.zeros((1, B, vpad), jnp.float32)
        else:
            noise = jax.random.gumbel(rng, (L, B, vpad), dtype=jnp.float32)
            noise = jax.lax.with_sharding_constraint(
                noise, NamedSharding(mesh, P(None, "dp"))
            )
        state0, aux = self._v3_state0(t, n_spans, no_whole, B)
        cache = jnp.zeros(
            (cfg.num_decoder_layers, B, L, 2 * cfg.d_model), cfg.dtype
        )

        def shard_fn(packed, state0, aux, span_types, noise, cache,
                     cross_kv, cross_len):
            return self._v3_loop(
                t, cfg, packed, state0, aux, span_types, noise, cache,
                cross_kv, cross_len, L,
            )

        b_axis1 = P(None, "dp")
        sm_kwargs = dict(
            mesh=mesh,
            in_specs=(P(), b_axis1, b_axis1, P("dp"), b_axis1, b_axis1,
                      b_axis1, P("dp")),
            out_specs=(P("dp"), P("dp"), P("dp")),
        )
        try:
            sharded = shard_map(shard_fn, check_vma=False, **sm_kwargs)
        except TypeError:  # pragma: no cover - pre-check_vma jax
            sharded = shard_map(shard_fn, check_rep=False, **sm_kwargs)
        out, lengths, steps_b = sharded(
            packed, state0, aux, span_types, noise, cache, cross_kv, cross_len
        )
        return DecodeResult(tokens=out, lengths=lengths, steps=jnp.max(steps_b))

    def _decode_v4(
        self, t, cfg, packed, cross_kv, cross_len, span_types, n_spans,
        no_whole, rng, B, L,
    ) -> DecodeResult:
        """Kernel-looped decode: token_chunk tokens per pallas program."""
        from ..ops.decode_step import fused_decode_tokens

        T_chunk = self.token_chunk
        vpad = vocab_pad(t.vocab_size)
        # chunked stepping overruns position L-1 by up to T_chunk-1 slots on
        # the final chunk; pad every per-position buffer by 64 slop rows so
        # capacity matches v3's full L exactly.  64 (not CHUNK) keeps
        # Lp // CHUNK — the attend's chunk count — unchanged: the slop rows
        # are written but never streamed (n_valid < L always).
        assert T_chunk <= 64, T_chunk
        Lp = L + 64
        if self.greedy:
            noise = jnp.zeros((1, B, vpad), jnp.float32)  # never read
        else:
            noise = jax.random.gumbel(rng, (Lp, B, vpad), dtype=jnp.float32)
        out = jnp.zeros((B, Lp), jnp.int32).at[:, 0].set(t.mask_index)
        state0, aux = self._v3_state0(t, n_spans, no_whole, B)
        cache = jnp.zeros(
            (cfg.num_decoder_layers, B, Lp, 2 * cfg.d_model), cfg.dtype
        )

        def cond(carry):
            pos, state, out, cache = carry
            # same positional capacity as v3 (pos + 1 < L)
            return (pos + 1 < L) & jnp.any(state[ST_DONE] == 0)

        def body(carry):
            pos, state, out, cache = carry
            new_state, tokens, new_kv = fused_decode_tokens(
                packed, self.sampling_tables, state, aux, span_types, noise,
                cache, cross_kv, pos, cross_len,
                n_layers=cfg.num_decoder_layers, d_model=cfg.d_model,
                nhead=cfg.nhead, d_ff=cfg.d_ff, vpad=vpad, mode=t.mode,
                max_spans=self.max_spans, span_cap=self.span_cap,
                eos_index=t.eos_index, mask_index=t.mask_index,
                nucleus_p=self.nucleus_p, temperature=self.temperature,
                greedy=self.greedy, n_sid=N_SID, span_body=SPAN_BODY,
                T_chunk=T_chunk, interpret=self.interpret,
            )
            out = jax.lax.dynamic_update_slice(out, tokens.T, (0, pos + 1))
            # splice the whole chunk's K/V rows at once: (nl,T,B,2D)->(nl,B,T,2D)
            cache = jax.lax.dynamic_update_slice(
                cache, jnp.transpose(new_kv, (0, 2, 1, 3)).astype(cache.dtype),
                (0, 0, pos, 0),
            )
            return pos + T_chunk, new_state, out, cache

        carry = (jnp.int32(0), state0, out, cache)
        pos, state, out, cache = jax.lax.while_loop(cond, body, carry)
        # Chunked stepping may overshoot a mid-chunk finish, and a stream
        # still live near the cap decodes up to T_chunk-1 tokens past L into
        # the slop rows (the in-kernel cap is per chunk).  Clamp lengths to
        # the advertised max_tgt_len, zero everything past the per-element
        # length, and trim the slop so output shape matches v3 exactly.
        lengths = jnp.minimum(state[ST_LEN], L)
        valid = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) < lengths[:, None]
        out = jnp.where(valid, out, 0)[:, :L]
        # pos advances in T_chunk increments and can overshoot a mid-chunk
        # finish by T_chunk-1; reconstruct v3's loop-iteration count.  A
        # row's finish iteration equals its unclamped ST_LEN (the eos/done
        # sampling writes a zero that is not counted), so the slowest row
        # sets the count; v3 caps iterations at L - 1 (cond: pos + 1 < L),
        # which also covers rows that here ran on into the slop region; and
        # if the loop never entered (all spans done at start, or L <= 1)
        # v3 reports 0 while ST_LEN is initialized to 1.
        ran = (L > 1) & jnp.any(state0[ST_DONE] == 0)
        steps = jnp.where(
            ran, jnp.minimum(jnp.max(state[ST_LEN]), L - 1), 0
        )
        return DecodeResult(tokens=out, lengths=lengths, steps=steps)


def pad_to_bucket(
    ids: np.ndarray, bucket: int = 512, cap: int = 2048, hard_cap: int = 2400
) -> np.ndarray:
    """Pad a (B, S) id matrix to a bucketed length to bound recompiles.

    Default bucket matches the fused decode kernel's KV CHUNK so the fast
    path stays eligible.  A source longer than ``cap`` (rare: serving
    streams are 16-bar windows, typically 400-900 tokens) falls back to
    256-bucketing; ``hard_cap`` (the model's positional limit) truncates
    anything longer — the decoder then auto-selects the XLA step path
    instead of the fused kernel.
    """
    S = ids.shape[1]
    if S > cap:
        # beyond the fused-kernel-eligible ceiling: 256-bucket up to the
        # model's positional limit, truncating past it
        target = min(int(np.ceil(S / 256)) * 256, hard_cap)
        if target <= S:
            return ids[:, :target]
        return np.pad(ids, ((0, 0), (0, target - S)))
    target = int(np.ceil(max(S, 1) / bucket)) * bucket
    return np.pad(ids, ((0, 0), (0, target - S)))
