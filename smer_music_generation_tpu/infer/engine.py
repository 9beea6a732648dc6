"""Host-side infilling orchestration around the jitted decode loop.

Equivalent of reference ``generation.py:230-877``: build the masked source,
run the (batched, compiled) decoder, splice results back, repair bar
durations, rewrite controls from the UI dict.  The per-token model calls
and grammar checks all live on device (``infer/decode.py``); this module is
pure numpy/python string work.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, replace
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.durations import DurationTable, duration_table_for_signature
from ..codec.structure import bar_with_track_positions, track_names_of
from ..data.masking import copy_bar_controls_to_end
from ..vocab import ALL_KEY_NAMES, WordVocab
from .decode import InfillDecoder, pad_to_bucket
from .grammar import SPAN_CODE

TOTAL_TRACK_CONTROL_TYPES = 3


def _split_spans(generated: Sequence[str]) -> List[List[str]]:
    """Decoder output stream -> list of spans (split on ``m_0`` markers)."""
    spans: List[List[str]] = []
    for tok in generated:
        if tok == "m_0":
            spans.append([])
        elif spans:
            spans[-1].append(tok)
    return spans


def fill_empty_bars(
    events: List[str],
    generate_bar_number: int,
    table: DurationTable,
    mode: int = 0,
) -> List[str]:
    """Extend the song with placeholder bars to be infilled.

    Divergence from reference ``generation.py:230-245``: the reference
    emits legacy tokens (``a_0``, ``rest_e``) that are not in its own
    vocabulary; here the appended bars follow the live control-mode-2
    layout (``s_2`` tension slot, neutral ``d_0 o_0 y_0`` controls, full-bar
    rest) so every token is encodable.  Mode 1 (REMI) has no rest tokens —
    an empty bar is simply a track with no onsets.
    """
    bar_duration_list = (
        ["rest"] + table.time_to_names(table.bar_duration) if mode == 0 else []
    )
    track_names = track_names_of(events)
    for _ in range(generate_bar_number):
        events.append("bar")
        events.append("s_2")
        for name in track_names:
            events.append(name)
            events.extend(["d_0", "o_0", "y_0"])
            events.extend(bar_duration_list)
            events.extend(["d_0", "o_0", "y_0"])
        events.append("s_2")
    return events


def mask_bar_and_track(
    events: Sequence[str],
    vocab: WordVocab,
    mask_tracks: Sequence[int],
    mask_bars: Sequence[int],
) -> Optional[Tuple[np.ndarray, List[int], List[int], List[int]]]:
    """Replace (bar, track) bodies and their end-control slots with ``m_0``.

    Returns (src ids, span type codes, masked track ids, masked bar ids).
    Expects the control-mode-2 serving layout: per-track leading ``d o y``,
    trailing ``d o y`` copies, and a trailing tensile copy on the last
    track of each bar (reference ``generation.py:248-341``).
    """
    track_names, bar_poses, bars = bar_with_track_positions(events)
    masked_pairs: List[Tuple[int, int]] = []
    span_codes: List[int] = []
    mask_bar_names: List[int] = []
    mask_track_names: List[int] = []

    for bar_num in mask_bars:
        if bar_num >= len(bars):
            return None
        for track_pos, (track_start, track_end) in enumerate(bars[bar_num]):
            if track_pos not in mask_tracks:
                continue
            mask_bar_names.append(bar_num)
            mask_track_names.append(track_pos)
            head = list(events[track_start : track_start + TOTAL_TRACK_CONTROL_TYPES])
            if not is_control_copy_run(head):
                raise ValueError(
                    "bar-track segment lacks the 3-copy d/o/y control head "
                    f"the serving layout requires (got {head}); streams from "
                    "partial-control (-t 2/3/4) builds cannot drive "
                    "infilling — the reference engine hardcodes the same "
                    "layout (generation.py:248-341)."
                )
            token_start = track_start + TOTAL_TRACK_CONTROL_TYPES
            tensile_end = (
                1 if events[track_end - 1] in vocab.name_to_tokens.get("tensile", []) else 0
            )
            token_end = track_end - TOTAL_TRACK_CONTROL_TYPES - tensile_end
            masked_pairs.append((token_start, token_end))
            span_codes.append(SPAN_CODE["r"])
            for i, code in enumerate(["d", "o", "p", "t"][: TOTAL_TRACK_CONTROL_TYPES + tensile_end]):
                masked_pairs.append((token_end + i, token_end + 1 + i))
                span_codes.append(SPAN_CODE[code])

    if not masked_pairs:
        return None

    token_events = list(events)
    order = sorted(range(len(masked_pairs)), key=lambda i: masked_pairs[i][0])
    span_codes = [span_codes[i] for i in order]
    pairs_sorted = [masked_pairs[i] for i in order]
    for lo, hi in reversed(pairs_sorted):
        del token_events[lo:hi]
        token_events.insert(lo, "m_0")

    src = np.array([vocab.char2index(tok) for tok in token_events], dtype=np.int32)
    return src, span_codes, mask_track_names, mask_bar_names


def is_control_copy_run(c: Sequence[str]) -> bool:
    """True for an exact 3-token d/o/y control-copy run (any token possibly
    blanked to ``unk`` by ``change_controls`` / unk-mode corruption) — the
    per-track head/trail layout control-mode-2 serving streams carry
    (reference ``dataset.py:121-153``, ``generation.py:248-341``).  Shared
    by the engine's body-bounds/masking and the eval harness so their
    segment parses can never disagree."""
    return len(c) == TOTAL_TRACK_CONTROL_TYPES and all(
        t == "unk" or t[:2] in ("d_", "o_", "y_") for t in c
    )


def decode_headers(events: Sequence[str]) -> List[str]:
    """``[time_sig, tempo, i_* programs...]`` — the header slice
    ``bar_events_to_midi`` consumes when re-measuring decoded bars
    (reference ``preprocessing.py:755-958`` header parse)."""
    bar0 = next(i for i, t in enumerate(events) if t == "bar")
    return [events[0], events[1]] + [t for t in events[:bar0] if t.startswith("i_")]


def restore_marked_input(
    src_tokens: Sequence[str], generated_output: Sequence[str]
) -> List[str]:
    """Splice generated spans back into the masked source.

    ``generated_output`` is the decoder stream: spans concatenated, each
    introduced by ``m_0`` (reference ``generation.py:417-465``).
    """
    gen = list(generated_output)
    mask_positions = [i for i, tok in enumerate(gen) if tok == "m_0"]
    spans: List[List[str]] = []
    for i, start in enumerate(mask_positions):
        end = mask_positions[i + 1] if i + 1 < len(mask_positions) else len(gen)
        spans.append(gen[start + 1 : end])

    out: List[str] = []
    si = 0
    for tok in src_tokens:
        if tok == "m_0" and si < len(spans):
            out.extend(spans[si])
            si += 1
        else:
            out.append(tok)
    return out


def check_track_total_time(
    events: List[str], table: DurationTable
) -> Tuple[bool, List[str]]:
    """Verify a generated track body closes its bar exactly; repair if not.

    Simulates the event VM's cursor (``rest`` advances, ``sep`` rewinds to
    the previous group's start) and rewrites the final duration group so
    the track sums to the bar duration (reference ``generation.py:344-414``
    / ``evaluation.py:740-818``; those versions treat ``sep`` groups as
    plain advances via a dead legacy ``rest_s`` branch — this one accounts
    for the rewind, matching the decoder's actual timing).
    """
    bar_duration = table.bar_duration
    if len(events) == 0:
        parts = table.time_to_names(bar_duration)
        return False, ["rest"] + parts

    current = 0.0
    previous_duration = 0.0
    duration_list: List[str] = []
    in_duration = False
    is_sep = False
    new_events: List[str] = []
    last_group_time = 0.0
    truncated = False

    for i, event in enumerate(events):
        new_events.append(event)
        if in_duration and event not in table.name_to_time:
            last_group_time = table.total_duration(duration_list)
            start = current - previous_duration if is_sep else current
            current = start + last_group_time
            previous_duration = last_group_time
            in_duration = False
            is_sep = False
            if current >= bar_duration:
                truncated = i < len(events) - 1
                break
            duration_list = []
        if event in table.name_to_time:
            in_duration = True
            duration_list.append(event)
            continue
        if event == "sep":
            is_sep = True

    else:
        if duration_list:
            last_group_time = table.total_duration(duration_list)
            start = current - previous_duration if is_sep else current
            current = start + last_group_time

    while new_events and new_events[-1] not in table.name_to_time:
        new_events.pop()
    if abs(current - bar_duration) < 1e-9:
        # exact close; a truncated stream still needs the caller to adopt
        # the trimmed body
        return (not truncated), new_events
    if current == 0.0 or not new_events:
        parts = table.time_to_names(bar_duration)
        return False, ["rest"] + parts

    adjusted = last_group_time + (bar_duration - current)
    if adjusted <= 0:
        adjusted = table.sixteenth
    parts = table.time_to_names(adjusted)
    # Replace the final duration group = the trailing run of duration
    # tokens.  (Popping len(duration_list) is wrong when the stream was
    # cap-truncated mid-group: duration_list is empty then, but `current`
    # still includes the last CLOSED group, so it must be swapped out.)
    while new_events and new_events[-1] in table.name_to_time:
        new_events.pop()
    new_events.extend(parts)
    return False, new_events


def change_controls(original_event: List[str], controls: Dict, vocab: WordVocab) -> List[str]:
    """Rewrite control tokens from the UI dict then copy them to span ends
    (reference ``generation.py:698-877``)."""
    event = list(original_event)
    arr = np.array(event)
    track_names = track_names_of(event)
    track_nums = len(track_names)
    bar_poses = np.where(arr == "bar")[0]

    header = event[: bar_poses[0]]
    d_pos = [i for i, tok in enumerate(header) if tok.startswith("d_")]
    o_pos = [i for i, tok in enumerate(header) if tok.startswith("o_")]
    y_pos = [i for i, tok in enumerate(header) if tok.startswith("y_")]

    for t_num in range(track_nums):
        key = f"track_{track_names[t_num][-1]}_c"
        if key not in controls:
            continue
        if t_num < len(d_pos):
            event[d_pos[t_num]] = f"d_{controls[key]['density']}"
        if t_num < len(o_pos):
            event[o_pos[t_num]] = f"o_{controls[key]['occupation']}"
        if t_num < len(y_pos):
            event[y_pos[t_num]] = f"y_{controls[key]['polyphony']}"

    _, _, bars = bar_with_track_positions(event)

    if controls.get("bar_track") == 0:
        for bar_num, tracks_in_bar in enumerate(bars):
            for track_pos, (track_start, _) in enumerate(tracks_in_bar):
                name = track_names[track_pos]
                bd = controls["bar_density"][name][bar_num]
                bo = controls["bar_occupation"][name][bar_num]
                bp = controls["bar_polyphony"][name][bar_num]
                event[track_start] = "unk" if bd == 10 else f"d_{bd}"
                event[track_start + 1] = "unk" if bo == 10 else f"o_{bo}"
                event[track_start + 2] = "unk" if bp == 10 else f"y_{bp}"
    else:
        for bar_num, tracks_in_bar in enumerate(bars):
            if controls.get("s_bar", 0) <= bar_num <= controls.get("e_bar", len(bars)):
                for track_pos, (track_start, _) in enumerate(tracks_in_bar):
                    if controls.get(track_names[track_pos]) == 0:
                        event[track_start] = "unk"
                        event[track_start + 1] = "unk"
                        event[track_start + 2] = "unk"

    return copy_bar_controls_to_end(event, vocab, TOTAL_TRACK_CONTROL_TYPES, True)


# ---------------------------------------------------------------------------
# The infilling engine
# ---------------------------------------------------------------------------


@dataclass
class InfillResult:
    events: List[str]  # restored full stream
    generated: List[str]  # raw decoder stream (m_0-separated spans)
    mask_tracks: List[int]
    mask_bars: List[int]
    decode_steps: int
    # reference parity: ``corrected_times`` / ``failed_times_list``
    # (evaluation.py:1300-1397) — here per request, not per span, because
    # the batched engine re-decodes all live spans in one program
    time_corrections: int = 0  # re-decode attempts before spans closed
    time_failed: bool = False  # exhausted retries; forced repair applied
    # per-span-group counts (run_with_span_retries only) — the reference's
    # per-span time_correct_list granularity (evaluation.py:1319-1328)
    time_corrections_per_span: Optional[List[int]] = None
    time_failed_per_span: Optional[List[int]] = None


@dataclass
class PreparedRequest:
    """A masked infill request ready for (batched) device decode."""

    src: np.ndarray  # (S,) int32 masked source ids
    span_codes: List[int]
    mask_tracks: List[int]
    mask_bars: List[int]
    table: DurationTable
    no_whole_duration: bool


class InfillEngine:
    """generation_all equivalent (reference ``generation.py:468-696``).

    One object holds the compiled decoder; each call masks the requested
    (bar, track) slots, runs the device decode loop once, restores the
    stream and repairs bar durations host-side (bounded retries around a
    fresh jitted decode, reference ``evaluation.py:1300-1397``).
    """

    def __init__(
        self,
        model,
        params,
        vocab: WordVocab,
        nucleus_p: Optional[float] = 0.9,
        temperature: float = 1.0,
        greedy: bool = False,
        max_tgt_len: int = 1024,
        max_time_fix_attempts: int = 10,
        quant: str = "none",
        mesh=None,
        draft_k: int = 0,
    ):
        """``mesh``: a ``parallel.mesh.make_mesh`` device mesh for
        multi-chip batched serving — parameters are replicated once and
        every batch's leading axis is sharded over the ``dp`` axis
        (SURVEY §2.5).  The fused decode kernel is shard_mapped over dp
        (each chip runs the pallas loop on its local slice — N chips keep
        N x the single-chip fused aggregate); batch shapes that fall off
        the per-shard kernel gate use the XLA decode path, which XLA
        partitions transparently."""
        self.model = model
        self.vocab = vocab
        self.max_time_fix_attempts = max_time_fix_attempts
        self.mesh = mesh
        if mesh is not None and quant != "none":
            raise ValueError(
                "dp-sharded serving (mesh=...) does not support quantized "
                "weight streaming; drop quant or the mesh"
            )
        self.decoder = InfillDecoder(
            model,
            vocab,
            max_tgt_len=max_tgt_len,
            nucleus_p=nucleus_p,
            temperature=temperature,
            greedy=greedy,
            quant=quant,
            mesh=mesh,
            draft_k=draft_k,
        )
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            self._batch_sharding = batch_sharding(mesh)
            params = jax.device_put(params, replicated(mesh))
        self.params = params

    def _shard_batch(self, arr):
        """Place a (B, ...) host array on the dp mesh when configured."""
        if self.mesh is None:
            return arr
        B = arr.shape[0]
        if B % self.mesh.shape["dp"] != 0:
            # Correct but loses data parallelism; run_batch pads to avoid
            # this, so a direct caller hitting it should know (VERDICT r1).
            warnings.warn(
                f"batch of {B} rows is not divisible by dp={self.mesh.shape['dp']}; "
                "placing unsharded (no data parallelism for this call). "
                "Pad the batch to a multiple of dp to shard it.",
                stacklevel=3,
            )
            return arr
        return jax.device_put(jnp.asarray(arr), self._batch_sharding)

    def _dispatch(self, src_b, span_types, n_spans, no_whole, rng):
        return self.decoder(
            self.params,
            self._shard_batch(src_b),
            self._shard_batch(span_types),
            self._shard_batch(np.asarray(n_spans)),
            self._shard_batch(np.asarray(no_whole)),
            rng,
        )

    def prepare(
        self,
        events: Sequence[str],
        tracks_to_generate: Sequence[int],
        bars_to_generate: Sequence[int],
    ) -> Optional["PreparedRequest"]:
        """Mask the requested slots; returns the device-ready request."""
        events = list(events)
        numerator = int(events[0].split("/")[0])
        denominator = int(events[0].split("/")[1])
        table = duration_table_for_signature((numerator, denominator), tempo=60.0)
        no_whole_duration = not (numerator >= 4 and denominator == 4)

        track_names = track_names_of(events)
        try:
            track_ids = [track_names.index(f"track_{t}") for t in tracks_to_generate]
        except ValueError:
            # a requested track does not exist in this stream: unfillable
            # request -> None, like every other invalid-request path
            return None

        # mask_bar_and_track expects the control-mode-2 serving layout
        # (trailing d/o/y copies + bar-end tensile).  Stored dataset windows
        # carry leading copies only; insert the end copies the way training
        # and the reference's eval batch prep do (dataset.py:121-153,
        # evaluation.py:1916-1956).  No-op on streams that already have
        # them; must run before fill_empty_bars (whose appended bars are
        # already mode-2, which would defeat the idempotence guard).
        events = copy_bar_controls_to_end(
            events, self.vocab, TOTAL_TRACK_CONTROL_TYPES,
            "tensile" in self.vocab.class_names,
        )

        n_bars = len([e for e in events if e == "bar"])
        if bars_to_generate and bars_to_generate[-1] >= n_bars:
            events = fill_empty_bars(
                events, bars_to_generate[-1] - n_bars + 1, table,
                mode=self.vocab.mode,
            )

        result = mask_bar_and_track(events, self.vocab, track_ids, bars_to_generate)
        if result is None:
            return None
        src, span_codes, mask_track_names, mask_bar_names = result
        return PreparedRequest(
            src=src,
            span_codes=span_codes,
            mask_tracks=mask_track_names,
            mask_bars=mask_bar_names,
            table=table,
            no_whole_duration=no_whole_duration,
        )

    def run_batch(
        self,
        requests: Sequence["PreparedRequest"],
        rng,
        fix_durations: bool = True,
        correct_controls: bool = False,
    ) -> List[Optional[InfillResult]]:
        """Decode many infill requests as ONE batched device program.

        Requests may differ in source length (padded to a common bucket),
        span structure and time signature (per-element grammar flags).
        """
        B = len(requests)
        if B == 0:
            return []
        # first device-facing moment: resolve the decoder's auto backend
        # flags (deferred from construction — see decode.resolve_backend)
        self.decoder.resolve_backend()
        # Large batches run as fused-kernel groups of 8 per chip: the
        # kernel's aggregate throughput at B=8 is ~3x the XLA batched path
        # at B=16 (see infer/decode.py B gate), so chunking wins on both
        # throughput and per-request latency.  Under a dp mesh the group is
        # 8 x dp (each shard decodes 8).  All groups' first decodes are
        # DISPATCHED before the first (blocking, round-trip-priced)
        # device_get — jax dispatch is asynchronous, so the device
        # pipelines group k+1 while the host is fetching/restoring group k.
        dp = 1 if self.mesh is None else int(self.mesh.shape["dp"])
        group = 8 * dp

        def pad_decode(target: int) -> List[Optional[InfillResult]]:
            # pad with done-at-start dummies (n_spans = 0), decode once,
            # slice the padding off
            padded = list(requests)
            while len(padded) < target:
                padded.append(replace(requests[-1], span_codes=[]))
            asm = self._assemble(padded)
            out = self._dispatch(asm[0], asm[1], asm[2], asm[3], rng)
            return self._finish_group(
                padded, rng, asm, out,
                fix_durations=fix_durations, correct_controls=correct_controls,
            )[:B]

        if self.decoder.fused and B < group:
            # the kernel only compiles at per-shard batch 1 / 4 / 8 (lane
            # tiling — see decode.py's fused gate); pad up to the smallest
            # eligible size rather than silently losing the kernel to the
            # XLA fallback
            for target in (dp, 4 * dp, 8 * dp):
                if B <= target:
                    break
            if B != target:
                return pad_decode(target)
        elif self.mesh is not None and B % dp != 0:
            # XLA path over a mesh: the batch axis must divide dp for the
            # sharding to engage (and to bound the program count)
            return pad_decode(int(np.ceil(B / dp)) * dp)
        if B > group and self.decoder.fused:
            # pad the tail group to the full group size with done-at-start
            # dummies (n_spans = 0) so it reuses the B=group executable
            # instead of compiling a new program for the remainder shape
            padded = list(requests)
            while len(padded) % group:
                padded.append(replace(requests[-1], span_codes=[]))
            pending = []
            for i in range(0, len(padded), group):
                grp = padded[i : i + group]
                rng_g = jax.random.fold_in(rng, i)
                asm = self._assemble(grp)
                out = self._dispatch(asm[0], asm[1], asm[2], asm[3], rng_g)
                pending.append((grp, rng_g, asm, out))
            results: List[Optional[InfillResult]] = []
            for grp, rng_g, asm, out in pending:
                results.extend(
                    self._finish_group(
                        grp, rng_g, asm, out,
                        fix_durations=fix_durations,
                        correct_controls=correct_controls,
                    )
                )
            return results[:B]
        asm = self._assemble(requests)
        out = self._dispatch(asm[0], asm[1], asm[2], asm[3], rng)
        return self._finish_group(
            requests, rng, asm, out,
            fix_durations=fix_durations, correct_controls=correct_controls,
        )

    def _assemble(self, requests: Sequence["PreparedRequest"]):
        """Pack requests into device-ready batch arrays."""
        B = len(requests)
        max_spans = self.decoder.max_spans
        max_src = max(len(r.src) for r in requests)
        src_b = np.zeros((B, max_src), dtype=np.int32)
        span_types = np.zeros((B, max_spans), dtype=np.int32)
        n_spans = np.zeros((B,), dtype=np.int32)
        no_whole = np.zeros((B,), dtype=bool)
        overflow = [i for i, r in enumerate(requests) if len(r.span_codes) > max_spans]
        for i, r in enumerate(requests):
            if i in overflow:
                continue  # decoded as a no-op; result reported as None below
            src_b[i, : len(r.src)] = r.src
            span_types[i, : len(r.span_codes)] = r.span_codes
            n_spans[i] = len(r.span_codes)
            no_whole[i] = r.no_whole_duration
        src_b = pad_to_bucket(src_b)
        return src_b, span_types, n_spans, no_whole, overflow

    def _finish_group(
        self,
        requests: Sequence["PreparedRequest"],
        rng,
        asm,
        out0,
        fix_durations: bool,
        correct_controls: bool,
    ) -> List[Optional[InfillResult]]:
        src_b, span_types, n_spans, no_whole, overflow = asm

        # Host-driven regeneration loop around the jitted decode (reference
        # ``evaluation.py:1300-1397``): elements whose generated bars do not
        # close their bar duration are re-decoded with fresh sampling noise
        # (up to max_time_fix_attempts) before the forced duration repair
        # rewrites them.  Settled elements stay in the batch with
        # n_spans = 0 (done at step 0) so every retry reuses the SAME
        # compiled program.  Greedy decoding is deterministic — retrying
        # cannot change the outcome, so it goes straight to repair.
        retries = (
            self.max_time_fix_attempts
            if fix_durations and self.vocab.mode == 0 and not self.decoder.greedy
            else 0
        )
        live = n_spans.copy()
        settled: Dict[int, Tuple[List[str], List[str], int, int, bool]] = {}
        check_close = fix_durations and self.vocab.mode == 0
        # src never changes across retries; decode it off the hot loop (the
        # retry path is already round-trip bound on the device_get)
        src_tokens_all = [
            [self.vocab.index2char(int(t)) for t in r.src] for r in requests
        ]
        rng_try = rng
        for attempt in range(1 + retries):
            # attempt 0 was dispatched by run_batch (possibly pipelined
            # behind other groups); retries re-decode only live elements
            out = (
                out0
                if attempt == 0
                else self._dispatch(src_b, span_types, live, no_whole, rng_try)
            )
            # single host transfer: over a remote/tunnelled backend every
            # device->host fetch pays a full round trip
            tokens_all, lengths, steps = jax.device_get(
                (out.tokens, out.lengths, out.steps)
            )
            for i, r in enumerate(requests):
                if i in overflow or i in settled or live[i] == 0:
                    continue
                generated = [
                    self.vocab.index2char(t) for t in tokens_all[i][: int(lengths[i])]
                ]
                restored = restore_marked_input(src_tokens_all[i], generated)
                last = attempt == retries
                closed = self._spans_close(restored, r) if check_close else True
                if last or closed:
                    settled[i] = (restored, generated, int(steps), attempt, closed)
                    live[i] = 0
            if not np.any(live):
                break
            rng_try = jax.random.fold_in(rng_try, attempt + 1)

        results: List[Optional[InfillResult]] = []
        for i, r in enumerate(requests):
            if i in overflow:
                # more masked spans than the decoder's static budget; the
                # caller should mask fewer bars/tracks per request
                results.append(None)
                continue
            if i not in settled:  # n_spans was 0 from the start
                settled[i] = (list(src_tokens_all[i]), [], 0, 0, True)
            restored, generated, steps_i, attempts_i, closed_i = settled[i]
            if fix_durations and self.vocab.mode == 0:
                # REMI (mode 1) has explicit onsets; bar-sum repair is a
                # SMER-only concern
                restored = self._repair_durations(restored, r.table)
            if correct_controls:
                restored = self._correct_controls(restored, r.mask_bars, r.mask_tracks)
            results.append(
                InfillResult(
                    events=restored,
                    generated=generated,
                    mask_tracks=r.mask_tracks,
                    mask_bars=r.mask_bars,
                    decode_steps=steps_i,
                    time_corrections=attempts_i,
                    time_failed=not closed_i,
                )
            )
        return results

    def _body_bounds(
        self, events: List[str], track_start: int, track_end: int
    ) -> Tuple[int, int]:
        """(body_start, body_end) of one bar-track segment.

        Trailing control copies and the at-end tensile token exist only in
        control-mode-2 streams (reference ``dataset.py:121-153``) — detect
        them by token class instead of assuming the layout, so leading-only
        (control-mode 0/1) streams keep their full body.
        """
        tens = self.vocab.name_to_tokens.get("tensile", [])

        end = track_end
        if events[end - 1] in tens:
            end -= 1
        elif events[end - 1] == "unk" and is_control_copy_run(
            list(events[end - 1 - TOTAL_TRACK_CONTROL_TYPES : end - 1])
        ):
            end -= 1  # corrupted at-end tensile, preceded by end copies
        if is_control_copy_run(list(events[end - TOTAL_TRACK_CONTROL_TYPES : end])):
            end -= TOTAL_TRACK_CONTROL_TYPES
        return track_start + TOTAL_TRACK_CONTROL_TYPES, end

    def _spans_close(self, events: List[str], req: "PreparedRequest") -> bool:
        """True when every regenerated (bar, track) body already sums to the
        bar duration exactly (no forced rewrite would be needed)."""
        try:
            _, _, bars = bar_with_track_positions(events)
        except (IndexError, ValueError):
            return False
        for bar_num, track_pos in zip(req.mask_bars, req.mask_tracks):
            if bar_num >= len(bars) or track_pos >= len(bars[bar_num]):
                return False
            track_start, track_end = bars[bar_num][track_pos]
            body_start, body_end = self._body_bounds(events, track_start, track_end)
            ok, _ = check_track_total_time(events[body_start:body_end], req.table)
            if not ok:
                return False
        return True

    def __call__(
        self,
        events: Sequence[str],
        tracks_to_generate: Sequence[int],
        bars_to_generate: Sequence[int],
        rng,
        fix_durations: bool = True,
        correct_controls=False,
        span_retries: bool = False,
    ) -> Optional[InfillResult]:
        """``correct_controls``: False, True (post-hoc rewrite of the
        restored stream) or ``"in_decode"`` (the reference's
        ``use_correct_control`` — later spans condition on measured
        controls; see :meth:`run_with_correct_controls`).

        ``span_retries``: regenerate per span group with a teacher-forced
        settled prefix (the reference's eval retry loop,
        ``evaluation.py:1300-1397``) instead of re-decoding the whole
        request.  Uses the XLA forced-prefix decoder, so serving keeps the
        fused whole-request path by default."""
        req = self.prepare(events, tracks_to_generate, bars_to_generate)
        if req is None:
            return None
        if correct_controls == "in_decode":
            return self.run_with_correct_controls(
                req, rng, fix_durations=fix_durations
            )
        if (
            span_retries
            and fix_durations
            and self.vocab.mode == 0
            and not self.decoder.greedy
            and self.max_time_fix_attempts > 0
        ):
            result = self.run_with_span_retries(req, rng, fix_durations=True)
            if result is not None and correct_controls:
                result.events = self._correct_controls(
                    result.events, req.mask_bars, req.mask_tracks
                )
            return result
        return self.run_batch(
            [req], rng, fix_durations=fix_durations, correct_controls=correct_controls
        )[0]

    def run_with_span_retries(
        self,
        req: "PreparedRequest",
        rng,
        fix_durations: bool = True,
    ) -> Optional[InfillResult]:
        """Per-span-group regeneration (reference ``evaluation.py:1300-1397``).

        Masked (bar, track) groups settle in source order: a group whose
        body closes the bar duration is accepted; otherwise it is re-decoded
        with fresh sampling noise while every already-settled group is
        teacher-forced, up to ``max_time_fix_attempts`` times, after which
        it is accepted as-is (and later rewritten by the forced duration
        repair) and the loop moves on — the reference's
        ``corrected_times > 10, continue generation`` branch (``:1326-1335``).

        Contrast :meth:`run_batch`'s whole-request retry, where ALL live
        spans must close in the same sample — with 16+ groups per request
        that almost never happens, so the batched path converges to "exhaust
        retries, force-repair everything".  Here each group retries
        independently, which is both the reference's behavior and far more
        likely to keep sampled (unrepaired) music.
        """
        state = self._settle_loop(
            req, rng,
            check_close=True,
            retry_time=True,
            # terminates: every iteration settles >= 1 group or increments
            # the current group's attempt counter, which is capped
            max_decodes=self._n_groups(req) * (self.max_time_fix_attempts + 1),
            settle_fn=None,
            final_replay=False,
        )
        return self._settled_result(state, req, fix_durations)

    def _settled_result(
        self, state, req: "PreparedRequest", fix_durations: bool
    ) -> Optional[InfillResult]:
        """`_settle_loop` state -> InfillResult (shared by both eval paths)."""
        if state is None:
            return None
        generated, restored, corrections, failed = state
        if fix_durations and self.vocab.mode == 0:
            restored = self._repair_durations(restored, req.table)
        return InfillResult(
            events=restored,
            generated=generated,
            mask_tracks=req.mask_tracks,
            mask_bars=req.mask_bars,
            decode_steps=len(generated),
            time_corrections=sum(corrections),
            time_failed=any(failed),
            time_corrections_per_span=corrections,
            time_failed_per_span=failed,
        )

    @staticmethod
    def _span_groups(req: "PreparedRequest") -> List[List[int]]:
        """Span indices grouped per masked (bar, track): each SPAN_BODY
        opens a group; the control spans that follow belong to it."""
        groups: List[List[int]] = []
        for k, code in enumerate(req.span_codes):
            if code == SPAN_CODE["r"]:
                groups.append([k])
            elif groups:
                groups[-1].append(k)
        return groups

    def _n_groups(self, req: "PreparedRequest") -> int:
        return len(self._span_groups(req))

    def _settle_loop(
        self,
        req: "PreparedRequest",
        rng,
        check_close: bool,
        retry_time: bool,
        max_decodes: int,
        settle_fn,
        final_replay: bool,
    ):
        """Shared per-group settle driver for the eval retry paths
        (reference ``evaluation.py:1217-1397``).

        Masked (bar, track) groups settle in source order.  A group whose
        body fails the bar-duration closure check is re-decoded with fresh
        noise (already-settled groups teacher-forced) up to
        ``max_time_fix_attempts`` times, then accepted as-is.  At settle
        time ``settle_fn(group, slot, spans, restored) -> {span_idx: token}``
        (``group`` = the group's span indices, ``slot`` = its
        ``(bar, track)``) may substitute tokens into later spans (the
        in-decode ``use_correct_control`` hook); a substitution forces the
        remainder to re-decode conditioned on it.  ``final_replay`` keeps
        looping after the last group settles so a trailing substitution is
        materialised by one fully-forced replay.

        Returns ``(generated, restored, corrections, failed)`` or None for
        empty/oversized requests.
        """
        decoder = self._eval_decoder
        src_tokens = [self.vocab.index2char(int(t)) for t in req.src]
        span_codes = list(req.span_codes)
        n_spans = len(span_codes)
        if n_spans == 0 or n_spans > decoder.max_spans:
            return None

        groups = self._span_groups(req)
        group_slots = sorted(zip(req.mask_bars, req.mask_tracks))

        src_b = pad_to_bucket(np.asarray(req.src, np.int32)[None])
        span_types = np.zeros((1, decoder.max_spans), np.int32)
        span_types[0, :n_spans] = span_codes
        n_spans_b = np.asarray([n_spans], np.int32)
        no_whole = np.asarray([req.no_whole_duration])

        settled = 0
        attempts: Dict[int, int] = {}
        corrections: List[int] = []
        failed: List[int] = []
        forced_stream: List[str] = []
        generated: List[str] = []
        restored = src_tokens
        decode_i = 0
        while decode_i < max_decodes and (final_replay or settled < len(groups)):
            if forced_stream:
                forced_ids = np.asarray(
                    [[self.vocab.char2index(t) for t in forced_stream]], np.int32
                )
                forced_len = np.asarray([len(forced_stream)], np.int32)
            else:
                forced_ids = forced_len = None
            out = decoder(
                self.params, src_b, span_types, n_spans_b, no_whole,
                jax.random.fold_in(rng, decode_i),
                forced=forced_ids, forced_len=forced_len,
            )
            decode_i += 1
            tokens, lengths = jax.device_get((out.tokens, out.lengths))
            generated = [
                self.vocab.index2char(int(t)) for t in tokens[0][: int(lengths[0])]
            ]
            spans = _split_spans(generated)
            restored = restore_marked_input(src_tokens, generated)
            if len(spans) < n_spans:
                # token budget exhausted; keep the partial splice
                # (unfilled slots retain their m_0 markers)
                break

            substituted = False
            progressed = True
            while settled < len(groups) and progressed:
                gi = settled
                bar_num, track_pos = group_slots[gi]
                time_ok = not check_close or self._group_closes(
                    restored, req, bar_num, track_pos
                )
                if (
                    not time_ok
                    and retry_time
                    and attempts.get(gi, 0) < self.max_time_fix_attempts
                ):
                    attempts[gi] = attempts.get(gi, 0) + 1
                    progressed = False
                    break
                # time settled (closed or retries exhausted)
                subs = (
                    settle_fn(groups[gi], group_slots[gi], spans, restored)
                    if settle_fn
                    else None
                )
                if subs:
                    for si, tok in subs.items():
                        spans[si] = [tok]
                corrections.append(attempts.get(gi, 0))
                failed.append(0 if time_ok else 1)
                settled = gi + 1
                if subs:
                    # later spans must re-decode conditioned on the
                    # substituted value
                    substituted = True
                    progressed = False
            if settled >= len(groups) and not substituted:
                break
            last_span = groups[settled - 1][-1] if settled else -1
            forced_stream = []
            for si in range(last_span + 1):
                forced_stream.append("m_0")
                forced_stream.extend(spans[si])
            if forced_stream:
                # close the LAST forced span: the decoder ends a forced span
                # only on a forced m_0 (decode.py _decode forced_end).  A
                # settled group always ends in a 1-token control span today,
                # whose control_done fires at the first unforced step and
                # emits the same boundary m_0 with the same noise rows — but
                # that is a coincidence of the span grammar, not the forced
                # contract; a body-terminal prefix would otherwise resume
                # sampling INSIDE content that already passed its closure
                # check.  Terminate explicitly.
                forced_stream.append("m_0")
            # if everything settled but the final substitution is not in
            # `generated` yet, the next iteration is a fully-forced replay
            # that materialises it, then breaks

        # groups left unsettled by an early break (token budget exhausted)
        # count as failed — the forced repair rewrites them downstream
        for gi in range(settled, len(groups)):
            corrections.append(attempts.get(gi, 0))
            failed.append(1)
        return generated, restored, corrections, failed

    def _group_closes(
        self, events: List[str], req: "PreparedRequest", bar_num: int, track_pos: int
    ) -> bool:
        """One (bar, track) group's body sums exactly to the bar duration."""
        try:
            _, _, bars = bar_with_track_positions(events)
        except (IndexError, ValueError):
            return False
        if bar_num >= len(bars) or track_pos >= len(bars[bar_num]):
            return False
        track_start, track_end = bars[bar_num][track_pos]
        body_start, body_end = self._body_bounds(events, track_start, track_end)
        ok, _ = check_track_total_time(events[body_start:body_end], req.table)
        return ok

    # ------------------------------------------------------------------
    @property
    def _eval_decoder(self) -> InfillDecoder:
        """XLA-path decoder with forced-prefix support (lazily built) for
        the in-decode correct-control mode — the fused kernels do not take
        a teacher-forced prefix."""
        dec = getattr(self, "_eval_decoder_cache", None)
        if dec is None:
            dec = InfillDecoder(
                self.model,
                self.vocab,
                max_tgt_len=self.decoder.max_tgt_len,
                max_spans=self.decoder.max_spans,
                nucleus_p=self.decoder.nucleus_p,
                temperature=self.decoder.temperature,
                greedy=self.decoder.greedy,
                fused=False,
            )
            self._eval_decoder_cache = dec
        return dec

    def run_with_correct_controls(
        self,
        req: "PreparedRequest",
        rng,
        fix_durations: bool = True,
        max_rounds: Optional[int] = None,
    ) -> Optional[InfillResult]:
        """In-decode ``use_correct_control`` (reference
        ``evaluation.py:1217-1288``): after each masked (bar, track) body
        decodes, its TRUE density/occupation/polyphony — and, on the last
        track of a bar, the bar's true tensile strain — replace the sampled
        control tokens, so every LATER span conditions on measured values.

        The reference interleaves this on the host per token; here the seam
        is between compiled decodes: decode the whole session, measure the
        earliest span group whose sampled controls disagree with the
        measured ones, substitute, teacher-force the stream up to that
        point and re-decode the remainder.  Each round settles at least one
        group, so rounds <= number of masked slots (and is 1 when the model
        already emits the measured values).

        The reference's ``use_correct_control`` eval still runs inside its
        ``check_total_time`` regeneration loop (``evaluation.py:1300-1397``),
        so this path ALSO retries each group for bar-duration closure (same
        semantics as :meth:`run_with_span_retries`): a group only settles —
        and only then has its controls measured and substituted — once its
        body closes the bar duration or ``max_time_fix_attempts`` fresh
        samples have been spent on it.
        """
        from ..eval.controllability import recompute_bar_track_control

        span_codes = list(req.span_codes)
        if not span_codes or len(span_codes) > self._eval_decoder.max_spans:
            # degenerate request (e.g. run_batch's n_spans=0 padding
            # dummies): bail before parsing the header below
            return None
        src_tokens = [self.vocab.index2char(int(t)) for t in req.src]

        header = decode_headers(src_tokens)
        key_token = src_tokens[2] if src_tokens[2].startswith("k_") else None
        key_name = (
            ALL_KEY_NAMES[int(key_token[2:])]
            if key_token is not None
            else None
        )

        def measure_and_substitute(group, slot, spans, restored):
            """Measure the settled group's body; substitute its sampled
            control copies with the measured values."""
            bar_num = slot[0]
            body = spans[group[0]]
            subs: Dict[int, str] = {}
            d, o, y = recompute_bar_track_control(body, header)
            measured = {
                SPAN_CODE["d"]: f"d_{d}" if d >= 0 else None,
                SPAN_CODE["o"]: f"o_{o}" if o >= 0 else None,
                SPAN_CODE["p"]: f"y_{y}" if y >= 0 else None,
            }
            for si in group[1:]:
                code = span_codes[si]
                if code == SPAN_CODE["t"]:
                    want = self._measured_tensile(
                        spans, src_tokens, bar_num, header, key_name
                    )
                else:
                    want = measured.get(code)
                if want is not None and spans[si] and spans[si][0] != want:
                    subs[si] = want
            return subs

        check_close = fix_durations and self.vocab.mode == 0
        state = self._settle_loop(
            req, rng,
            check_close=check_close,
            retry_time=(
                check_close
                and not self.decoder.greedy  # fresh noise needs sampling
                and self.max_time_fix_attempts > 0
            ),
            # terminates: every decode either increments one group's attempt
            # counter (capped) or settles >= 1 group; a settled group can
            # force at most one extra replay (its control substitution)
            max_decodes=(
                max_rounds
                if max_rounds is not None
                else self._n_groups(req) * (self.max_time_fix_attempts + 2) + 1
            ),
            settle_fn=measure_and_substitute,
            final_replay=True,
        )
        return self._settled_result(state, req, fix_durations)

    def _measured_tensile(
        self,
        spans: List[List[str]],
        src_tokens: List[str],
        bar_num: int,
        header: List[str],
        key_name: Optional[str],
    ) -> Optional[str]:
        """True ``s_*`` of a bar, measured from the restored stream (the
        bar's tracks include unmasked source content)."""
        from ..eval.controllability import recompute_bar_tension

        flat: List[str] = []
        for s in spans:
            flat.append("m_0")
            flat.extend(s)
        restored = restore_marked_input(src_tokens, flat)
        try:
            _, bar_poses, _ = bar_with_track_positions(restored)
        except (IndexError, ValueError):
            return None
        if bar_num >= len(bar_poses):
            return None
        lo = bar_poses[bar_num]
        hi = (
            bar_poses[bar_num + 1]
            if bar_num + 1 < len(bar_poses)
            else len(restored)
        )
        cat = recompute_bar_tension(restored[lo + 1 : hi], header, key_name)
        return f"s_{cat}" if cat is not None else None

    def _correct_controls(
        self, events: List[str], mask_bars: List[int], mask_tracks: List[int]
    ) -> List[str]:
        """Rewrite each regenerated slot's control copies with the
        *measured* controls of the generated body.

        Approximates the reference's ``use_correct_control``
        (``evaluation.py:1217-1288``), which substitutes the measured
        control during decoding; here the substitution is applied to the
        restored stream after the (single-program) decode.
        """
        from ..eval.controllability import recompute_bar_track_control

        out = list(events)
        header = decode_headers(out)
        _, _, bars = bar_with_track_positions(out)
        for bar_num, track_num in zip(mask_bars, mask_tracks):
            if bar_num >= len(bars) or track_num >= len(bars[bar_num]):
                continue
            track_start, track_end = bars[bar_num][track_num]
            tensile_end = (
                1
                if out[track_end - 1] in self.vocab.name_to_tokens.get("tensile", [])
                else 0
            )
            body = out[
                track_start + TOTAL_TRACK_CONTROL_TYPES
                : track_end - TOTAL_TRACK_CONTROL_TYPES - tensile_end
            ]
            d, o, y = recompute_bar_track_control(body, header)
            if o < 0:
                continue
            tokens = [f"d_{d}", f"o_{o}", f"y_{y}"]
            for k in range(TOTAL_TRACK_CONTROL_TYPES):
                out[track_start + k] = tokens[k]
                out[track_end - TOTAL_TRACK_CONTROL_TYPES - tensile_end + k] = tokens[k]
        return out

    def _repair_durations(self, events: List[str], table: DurationTable) -> List[str]:
        """Check every track body sums to the bar duration; rewrite tails."""
        _, _, bars = bar_with_track_positions(events)
        out = list(events)
        # walk bars in reverse so earlier indices stay valid after edits
        for tracks_in_bar in reversed(bars):
            for track_start, track_end in reversed(tracks_in_bar):
                body_start, body_end = self._body_bounds(out, track_start, track_end)
                if body_end <= body_start:
                    continue
                body = out[body_start:body_end]
                ok, fixed = check_track_total_time(body, table)
                # adopt the repaired body whenever it differs — the
                # reference assigns the returned list unconditionally
                # (evaluation.py:1304); ok only gates retries.  An exact
                # close can still trim a dangling terminator token.
                if not ok or fixed != body:
                    out[body_start:body_end] = fixed
        return out
