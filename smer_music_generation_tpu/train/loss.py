"""Fused multi-head weighted cross-entropy + on-device per-class accuracy.

The reference computes 7 + k separate ``nn.CrossEntropyLoss`` heads, each a
full (B*T, V) pass with a different 0/1 weight vector over token-class
index ranges, then sums them (``train.py:555-642,726-780``).  Because the
class ranges are disjoint, the *sum of heads* collapses to ONE weighted CE
whose per-token weight is ``W[target]`` with ``W = sum_h w_h``:

    total = sum_t nll_t * W[target_t] / sum_t ce_all[target_t]

so the whole loss is a single fused log-softmax + gather on device, and the
per-head scalars needed for logging are cheap segment-sums of the same
``nll`` vector grouped by target class.  Per-class accuracy
(``train.py:988-1034``, a per-token Python loop in the reference) is a
vectorized segment-sum here.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..vocab import WordVocab

# head order mirrors the reference criteria list (train.py:602) + controls
BASE_HEADS = ("meta", "structure", "time_signature", "tempo", "program", "pitch", "duration")
CONTROL_HEAD_ORDER = ("key", "tensile", "density", "polyphony", "occupation")


def build_loss_tables(
    vocab: WordVocab, head_scales: Dict[str, float] | None = None
) -> Dict[str, np.ndarray]:
    """Precompute the (H, V) head-weight matrix and helpers.

    * ``head_weights[h, v]`` = 1 where vocab index v belongs to head h
      (meta = the eos index only);
    * ``ce_all`` = 1 everywhere except 0 at pad/mask/unk (eos slot patched
      at runtime with the eos weight, reference ``train.py:565-575``);
    * ``class_ids`` = token-class id per vocab index for accuracy grouping.

    ``head_scales``: optional per-head loss multipliers (e.g.
    ``{"tensile": 3.0}``) — the recipe lever for steering experiments;
    the reference's per-head criteria all weigh 1 (``train.py:555-642``).
    """
    V = vocab.vocab_size
    heads: List[str] = list(BASE_HEADS) + [
        name for name in CONTROL_HEAD_ORDER if name in vocab.control_indices
    ]
    H = len(heads)
    head_weights = np.zeros((H, V), dtype=np.float32)
    head_index = {name: i for i, name in enumerate(heads)}

    head_weights[head_index["meta"], vocab.eos_index] = 1.0
    head_weights[head_index["structure"], 3:7] = 1.0
    head_weights[head_index["time_signature"], 7:11] = 1.0
    head_weights[head_index["tempo"], 11:18] = 1.0
    head_weights[head_index["program"], 18:146] = 1.0
    head_weights[head_index["pitch"], 146:234] = 1.0
    head_weights[head_index["duration"], 234 : 234 + len(vocab.duration_indices)] = 1.0
    for name in CONTROL_HEAD_ORDER:
        if name in vocab.control_indices:
            idxs = vocab.control_indices[name]
            head_weights[head_index[name], idxs[0] : idxs[-1] + 1] = 1.0

    if head_scales:
        unknown = set(head_scales) - set(heads)
        if unknown:
            raise ValueError(f"head_scales for absent heads: {sorted(unknown)}")
        for name, scale in head_scales.items():
            head_weights[head_index[name]] *= float(scale)

    ce_all = np.ones(V, dtype=np.float32)
    ce_all[vocab.pad_index] = 0.0
    ce_all[vocab.mask_indices[0]] = 0.0
    ce_all[vocab.unk_index] = 0.0

    # eos-slot multiplier per head: heads other than meta never weight eos,
    # meta weights it by the (schedule-dependent) eos weight
    eos_onehot = np.zeros(V, dtype=np.float32)
    eos_onehot[vocab.eos_index] = 1.0

    n_classes = len(vocab.class_id_names)
    return {
        "heads": heads,
        "head_weights": head_weights,
        "ce_all": ce_all,
        "eos_onehot": eos_onehot,
        "class_ids": vocab.token_class_ids.astype(np.int32),
        "n_classes": n_classes,
        "class_names": vocab.class_id_names,
        "pad_index": vocab.pad_index,
    }


def multihead_ce(
    logits: jax.Array,  # (B, T, V) float32
    targets: jax.Array,  # (B, T) int32
    tables: Dict,
    eos_weight: float | jax.Array = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Fused loss; returns (total, per-head scalars dict)."""
    head_weights = jnp.asarray(tables["head_weights"])  # (H, V)
    ce_all = jnp.asarray(tables["ce_all"])
    eos_onehot = jnp.asarray(tables["eos_onehot"])

    # runtime eos weighting: meta head scales its eos slot; ce_all too
    hw = head_weights.at[0].set(head_weights[0] * eos_weight)
    ce = ce_all * (1.0 - eos_onehot) + eos_onehot * eos_weight

    V = logits.shape[-1]
    flat_logits = logits.reshape(-1, V)
    flat_targets = targets.reshape(-1)

    logp = jax.nn.log_softmax(flat_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, flat_targets[:, None], axis=-1)[:, 0]
    # torch CrossEntropyLoss(ignore_index=0): positions with target==pad
    # contribute nothing regardless of weight
    not_pad = flat_targets != tables["pad_index"]
    nll = jnp.where(not_pad, nll, 0.0)

    denom = jnp.sum(jnp.where(not_pad, ce[flat_targets], 0.0))
    denom = jnp.maximum(denom, 1e-8)

    target_head_w = hw.T[flat_targets]  # (N, H)
    head_losses = jnp.sum(target_head_w * nll[:, None], axis=0) / denom  # (H,)
    total = jnp.sum(head_losses)

    per_head = {name: head_losses[i] for i, name in enumerate(tables["heads"])}
    return total, per_head


def soft_label_weights(
    vocab_size: int,
    target_index_range: Tuple[int, int],
    distance: str = "medium",
) -> np.ndarray:
    """Ordinal soft-label matrix over a contiguous token range.

    Reference ``soft_label`` / ``phi`` (``train.py:71-88``): softmax over
    the negative pairwise distances of the in-range ordinal positions
    (|d| for 'small', d^2 for 'medium', 2 d^2 for 'large').  Defined for
    parity with the reference's (unused-by-default) ``OrdinalLoss``.
    """
    lo, hi = target_index_range
    n = hi - lo + 1
    idx = np.arange(n, dtype=np.float64)
    diff = idx[:, None] - idx[None, :]
    if distance == "small":
        phi = np.abs(diff)
    elif distance == "large":
        phi = 2 * np.square(diff)
    else:
        phi = np.square(diff)
    w = np.exp(-phi)
    w = w / w.sum(axis=0, keepdims=True)
    out = np.zeros((vocab_size, vocab_size), dtype=np.float32)
    out[lo : hi + 1, lo : hi + 1] = w
    return out


def ordinal_loss(
    logits: jax.Array,
    targets: jax.Array,
    weights: np.ndarray,
) -> jax.Array:
    """Mean soft-label cross entropy (reference ``OrdinalLoss.forward``)."""
    logp = jax.nn.log_softmax(logits.reshape(-1, logits.shape[-1]), axis=-1)
    target_w = jnp.asarray(weights)[targets.reshape(-1)]
    return jnp.mean(jnp.sum(-target_w * logp, axis=1))


def per_class_accuracy(
    logits: jax.Array, targets: jax.Array, tables: Dict
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Vectorized per-class accuracy (reference ``accuracy``).

    Returns (correct_per_class, count_per_class, total_correct, total_count);
    pad targets are excluded.  Class ids follow ``tables['class_names']``.
    """
    class_ids = jnp.asarray(tables["class_ids"])
    n_classes = tables["n_classes"]
    pred = jnp.argmax(logits, axis=-1).reshape(-1)
    tgt = targets.reshape(-1)
    valid = tgt != tables["pad_index"]
    correct = (pred == tgt) & valid
    tgt_class = class_ids[tgt]
    # tokens whose class id is -1 (pad) route to a scratch bin
    tgt_class = jnp.where(valid & (tgt_class >= 0), tgt_class, n_classes)
    correct_pc = jax.ops.segment_sum(correct.astype(jnp.float32), tgt_class, n_classes + 1)[:-1]
    # invalid/classless tokens already route to the dropped scratch bin
    count_pc = jax.ops.segment_sum(jnp.ones_like(tgt, jnp.float32), tgt_class, n_classes + 1)[:-1]
    return correct_pc, count_pc, jnp.sum(correct), jnp.sum(valid)
