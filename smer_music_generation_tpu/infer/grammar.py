"""Grammar constraints for SMER decoding as dense boolean vocab masks.

The reference enforces decode-time grammar with per-token Python list
comprehensions over the vocabulary plus rejection resampling (<=10 tries)
around a 6-state machine (``generation.py:41-95,542-652``).  Rejection
sampling from a distribution whose banned mass is already ~0 (logits
overwritten with -100) is equivalent to renormalized masked sampling, so
here the whole machine becomes:

* a set of precomputed ``(V,)`` boolean class masks (from the vocabulary);
* :func:`allowed_mask` — a ``jnp.where`` chain following the reference's
  dispatch priority (in_sep > in_continue > in_pitch > in_rest > start >
  free);
* :func:`update_flags` — the pure transition function on the 4 state bits.

Everything is traced once and runs inside the jitted decode loop.

Conscious divergences (SURVEY.md §2.6): ``<pad>`` and ``m_0`` are banned in
every state (the reference leaves them sampleable at ~e^-100 mass), and the
``no_control`` flag actually bans control tokens (the reference's
membership test against ``dict.values()`` of lists is always False,
``generation.py:86``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..vocab import WordVocab

# span type codes (what each masked span must produce)
SPAN_BODY = 0  # 'r' — free-form track body
SPAN_DENSITY = 1  # 'd'
SPAN_OCCUPATION = 2  # 'o'
SPAN_POLYPHONY = 3  # 'p' (y_* tokens)
SPAN_TENSILE = 4  # 't'

SPAN_CODE = {"r": SPAN_BODY, "d": SPAN_DENSITY, "o": SPAN_OCCUPATION,
             "p": SPAN_POLYPHONY, "t": SPAN_TENSILE}


class GrammarState(NamedTuple):
    in_sep: jnp.ndarray
    in_continue: jnp.ndarray
    in_pitch: jnp.ndarray
    in_rest: jnp.ndarray

    @classmethod
    def zeros(cls, batch: int) -> "GrammarState":
        z = jnp.zeros((batch,), dtype=bool)
        return cls(z, z, z, z)


@dataclass
class GrammarTables:
    """Dense masks on device; build once per vocab (both encodings)."""

    pitch: jnp.ndarray
    duration_only: jnp.ndarray
    whole: jnp.ndarray
    rest: jnp.ndarray
    sep: jnp.ndarray
    continue_: jnp.ndarray
    step: jnp.ndarray  # e_* onset tokens (mode 1 only; zeros in mode 0)
    eos: jnp.ndarray
    control: jnp.ndarray
    always_banned: jnp.ndarray  # program/structure/time-sig/tempo/pad/mask
    span_family: jnp.ndarray  # (5, V): allowed family per span code (row 0 unused)
    continue_index: int
    eos_index: int
    mask_index: int
    vocab_size: int
    mode: int  # 0 = SMER, 1 = REMI

    @classmethod
    def build(cls, vocab: WordVocab) -> "GrammarTables":
        m = vocab.class_masks
        V = vocab.vocab_size
        always = (
            m["program"] | m["structure"] | m["time_signature"] | m["tempo"]
        ).copy()
        always[vocab.pad_index] = True
        always[vocab.mask_index] = True

        fam = np.zeros((5, V), dtype=bool)
        for code, name in (
            (SPAN_DENSITY, "density"),
            (SPAN_OCCUPATION, "occupation"),
            (SPAN_POLYPHONY, "polyphony"),
            (SPAN_TENSILE, "tensile"),
        ):
            if name in m:
                fam[code] = m[name]
        zeros = np.zeros(V, bool)
        return cls(
            pitch=jnp.asarray(m["pitch"]),
            duration_only=jnp.asarray(m["duration_only"]),
            whole=jnp.asarray(m.get("whole_duration", zeros)),
            rest=jnp.asarray(m.get("rest", zeros) if vocab.mode == 0 else zeros),
            sep=jnp.asarray(m.get("sep", zeros) if vocab.mode == 0 else zeros),
            continue_=jnp.asarray(m.get("continue", zeros)),
            step=jnp.asarray(m.get("step", zeros)),
            eos=jnp.asarray(m["eos"]),
            control=jnp.asarray(m["control"]),
            always_banned=jnp.asarray(always),
            span_family=jnp.asarray(fam),
            continue_index=getattr(vocab, "continue_index", -1),
            eos_index=vocab.eos_index,
            mask_index=vocab.mask_index,
            vocab_size=V,
            mode=vocab.mode,
        )


def allowed_mask(
    t: GrammarTables,
    state: GrammarState,
    is_start: jnp.ndarray,  # (B,) bool: only m_0 emitted so far in span
    span_type: jnp.ndarray,  # (B,) int32 span code
    no_whole_duration,  # scalar or (B,) bool (time signature < 4/4)
) -> jnp.ndarray:
    """(B, V) boolean mask, True = sampleable, per the dispatch priority."""
    B = state.in_sep.shape[0]
    V = t.vocab_size

    if t.mode == 1:
        return _allowed_mask_remi(t, state, is_start, span_type)

    no_whole = jnp.broadcast_to(jnp.asarray(no_whole_duration), (B,))
    whole_b = no_whole[:, None] & t.whole[None, :]  # (B, V)

    def bcast(mask):
        return jnp.broadcast_to(mask[None, :], (B, V))

    dur = bcast(t.duration_only) & ~whole_b
    free = ~(bcast(t.always_banned | t.control) | whole_b)
    start_body = free & bcast(~t.duration_only)  # start: eos/pitch/rest/sep/continue
    in_sep = bcast(~(t.always_banned | t.control | t.rest | t.sep | t.eos | t.whole))
    in_continue = bcast(t.pitch)
    in_pitch = bcast(t.pitch) | dur
    in_rest = dur

    start_mask = jnp.where(
        (span_type != SPAN_BODY)[:, None],
        t.span_family[span_type],
        start_body,
    )

    out = free
    out = jnp.where(is_start[:, None], start_mask, out)
    out = jnp.where(state.in_rest[:, None], in_rest, out)
    out = jnp.where(state.in_pitch[:, None], in_pitch, out)
    out = jnp.where(state.in_continue[:, None], in_continue, out)
    out = jnp.where(state.in_sep[:, None], in_sep, out)
    return out


def _allowed_mask_remi(
    t: GrammarTables,
    state: GrammarState,
    is_start: jnp.ndarray,
    span_type: jnp.ndarray,
) -> jnp.ndarray:
    """Mode-1 (REMI) grammar: a 3-state onset machine (reference
    ``evaluation.py:1150-1213`` + ``sampling_step_single/multi``):

    * A (default): expect an onset step ``e_*`` or ``<eos>``;
    * B (``in_continue`` bit): just emitted a step -> expect a pitch;
    * C (``in_pitch`` bit): in a pitch run -> pitch or ``n_*`` duration.
    """
    B = state.in_sep.shape[0]
    V = t.vocab_size

    state_a = t.step | t.eos
    state_b = t.pitch
    state_c = t.pitch | t.duration_only

    def bcast(mask):
        return jnp.broadcast_to(mask[None, :], (B, V))

    start_mask = jnp.where(
        (span_type != SPAN_BODY)[:, None],
        t.span_family[span_type],
        bcast(state_a),
    )
    out = bcast(state_a)
    out = jnp.where(state.in_pitch[:, None], bcast(state_c), out)
    out = jnp.where(state.in_continue[:, None], bcast(state_b), out)
    out = jnp.where(is_start[:, None], start_mask, out)
    return out


def update_flags(t: GrammarTables, state: GrammarState, idx: jnp.ndarray) -> GrammarState:
    """Transition on the sampled token (reference ``generation.py:654-671``;
    mode-1 transitions per ``evaluation.py:1150-1213``)."""
    is_pitch = t.pitch[idx]
    is_dur = t.duration_only[idx]
    if t.mode == 1:
        is_step = t.step[idx]
        false = jnp.zeros_like(is_pitch)
        return GrammarState(
            in_sep=false,
            in_continue=jnp.where(is_step, True, jnp.where(is_pitch | is_dur, False, state.in_continue)),
            in_pitch=jnp.where(is_pitch, True, jnp.where(is_step | is_dur, False, state.in_pitch)),
            in_rest=false,
        )
    is_cont = idx == t.continue_index
    is_sep = t.sep[idx]
    is_rest = t.rest[idx]
    return GrammarState(
        in_sep=jnp.where(is_sep, True, jnp.where(is_cont | is_pitch, False, state.in_sep)),
        in_continue=jnp.where(is_cont, True, jnp.where(is_pitch, False, state.in_continue)),
        in_pitch=jnp.where(is_pitch, True, jnp.where(is_dur, False, state.in_pitch)),
        in_rest=jnp.where(is_rest, True, jnp.where(is_dur, False, state.in_rest)),
    )
