"""Masking pipeline tests: reconstruction property + distribution checks."""

import numpy as np
import pytest

from smer_music_generation_tpu.codec.annotate import encode_midi
from smer_music_generation_tpu.data.loader import (
    BatchLoader,
    LoaderConfig,
    collate,
)
from smer_music_generation_tpu.data.masking import (
    MaskingConfig,
    MaskingPipeline,
    copy_bar_controls_to_end,
)
from smer_music_generation_tpu.vocab import CONTROL_SETS, WordVocab
from tests.test_annotate import make_two_track_score


@pytest.fixture(scope="module")
def vocab():
    return WordVocab(0, CONTROL_SETS[5])


@pytest.fixture(scope="module")
def control_events():
    score = make_two_track_score()
    events, _ = encode_midi(score, controls={"key": None}, track_names=["track_0", "track_1"])
    return events


def reconstruct(tokens, decoder_target, vocab):
    """Splice decoder spans back into the masked input (the round-trip the
    decoder is trained to perform)."""
    spans = []
    cur = []
    for idx in decoder_target:
        if idx == vocab.eos_index:
            spans.append(cur)
            cur = []
        else:
            cur.append(int(idx))
    out = []
    si = 0
    for t in tokens:
        if t == vocab.mask_index:
            out.extend(spans[si])
            si += 1
        else:
            out.append(int(t))
    assert si == len(spans)
    return out


def test_random_word_reconstruction(vocab, control_events):
    cfg = MaskingConfig(bar_track_control=True, control_corrupt_prob=0.0)
    pipe = MaskingPipeline(vocab, cfg, seed=1)
    prepared = pipe.prepare_group([control_events])
    tokens, din, dtgt = pipe.random_word(prepared)
    want = [vocab.char2index(t) for t in prepared[0]]
    got = reconstruct(tokens[0], dtgt[0], vocab)
    assert got == want
    # mask ratio in the right ballpark
    n_masked = int(np.sum(tokens[0] == vocab.mask_index))
    masked_tokens = len(dtgt[0]) - n_masked  # spans minus the eos terminators
    ratio = masked_tokens / len(want)
    assert 0.10 <= ratio <= 0.25
    # decoder_in = m_0-prefixed spans; target = spans + eos
    assert len(din[0]) == len(dtgt[0])


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_mask_bars_reconstruction(vocab, control_events, seed):
    cfg = MaskingConfig(bar_track_control=True, bar_control_at_end=False)
    pipe = MaskingPipeline(vocab, cfg, seed=seed)
    prepared = pipe.prepare_group([control_events])
    # freeze corruption off for exact reconstruction
    pipe._corrupt_track_controls = lambda *a, **k: None
    result = pipe.mask_bars(prepared)
    assert result is not None
    tokens, din, dtgt = result
    want = [vocab.char2index(t) for t in prepared[0]]
    got = reconstruct(tokens[0], dtgt[0], vocab)
    # mode 2's 10% tensile corruption may replace s_ with unk in the input
    for a, b in zip(got, want):
        if a != b:
            assert a == vocab.unk_index and vocab.get_token_classes(b) == "tensile"


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mask_bars_end_copy_reconstruction(vocab, control_events, seed):
    cfg = MaskingConfig(bar_track_control=True, bar_control_at_end=True)
    pipe = MaskingPipeline(vocab, cfg, seed=seed)
    prepared = pipe.prepare_group([control_events])
    pipe._corrupt_track_controls = lambda *a, **k: None
    # disable the 10% tensile corruption too (mode 2)
    tokens, din, dtgt = pipe.mask_bars(prepared)
    want = [vocab.char2index(t) for t in prepared[0]]
    got = reconstruct(tokens[0], dtgt[0], vocab)
    # tensile corruption (mode 2) may replace an s_ with unk in the input;
    # allow only unk-for-tensile mismatches
    diffs = [
        (a, b) for a, b in zip(got, want) if a != b
    ]
    for a, b in diffs:
        assert a == vocab.unk_index and vocab.get_token_classes(b) == "tensile"


def test_copy_bar_controls_to_end(vocab, control_events):
    out = copy_bar_controls_to_end(list(control_events), vocab, 3, True)
    # idempotent
    again = copy_bar_controls_to_end(list(out), vocab, 3, True)
    assert again == out
    # each track body now ends with d/o/y copies and each bar with an s copy
    from smer_music_generation_tpu.codec.structure import bar_with_track_positions

    _, bar_poses, bars = bar_with_track_positions(out)
    first_bar_tracks = bars[0]
    t0_start, t0_end = first_bar_tracks[0]
    assert out[t0_start][0] == "d" and out[t0_start + 1][0] == "o" and out[t0_start + 2][0] == "y"
    assert [out[t0_end - 3][0], out[t0_end - 2][0], out[t0_end - 1][0]] == ["d", "o", "y"]
    # bar end: last track of bar followed by the copied s token
    last_end = first_bar_tracks[-1][1]
    assert out[last_end - 1].startswith("s_") or out[last_end - 1] == "unk"


def test_mask_modes_distribution(vocab, control_events):
    cfg = MaskingConfig(bar_track_control=True)
    modes = []
    for seed in range(60):
        pipe = MaskingPipeline(vocab, cfg, seed=seed)
        p = pipe.rng.random()
        modes.append(0 if p > 0.6 else (1 if p > 0.3 else 2))
    # roughly 40/30/30
    assert modes.count(0) > 10 and modes.count(1) > 5 and modes.count(2) > 5


def test_collate_bucketing(vocab, control_events):
    cfg = MaskingConfig(bar_track_control=True)
    pipe = MaskingPipeline(vocab, cfg, seed=0)
    prepared = pipe.prepare_group([control_events])
    g = pipe.random_word(prepared)
    batch = collate([g], bucket=128)
    assert batch["input"].shape[1] % 128 == 0
    assert batch["target_in"].shape == batch["target_out"].shape
    assert batch["input_pad_mask"].dtype == bool
    assert np.all((batch["input"] == 0) == batch["input_pad_mask"])


def test_batch_loader_iterates(vocab, control_events):
    loader = BatchLoader(
        vocab,
        [[control_events], [control_events]],
        LoaderConfig(batch_size=2, pretraining=False),
        MaskingConfig(bar_track_control=True),
        seed=7,
    )
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["input"].ndim == 2 and b["target_in"].ndim == 2


def test_random_word_span_length_distribution(vocab, control_events):
    """Span lengths follow the 3/1/2 at .5/.25/.25 scheme statistically."""
    cfg = MaskingConfig(bar_track_control=True, control_corrupt_prob=0.0)
    lengths = []
    for seed in range(30):
        pipe = MaskingPipeline(vocab, cfg, seed=seed)
        prepared = pipe.prepare_group([control_events])
        tokens, din, dtgt = pipe.random_word(prepared)
        cur = 0
        for idx in dtgt[0]:
            if idx == vocab.eos_index:
                lengths.append(cur)
                cur = 0
            else:
                cur += 1
    from collections import Counter

    counts = Counter(lengths)
    assert set(counts) <= {1, 2, 3}
    # length 3 dominates (p=.5 of draws)
    assert counts[3] > counts[1] and counts[3] > counts[2]


def test_collate_buckets_row_count_with_neutral_dummies(vocab):
    """The batch dim buckets to row_bucket; dummy rows are loss-neutral."""
    import jax
    import jax.numpy as jnp

    from smer_music_generation_tpu.data.loader import collate
    from smer_music_generation_tpu.models.transformer import ModelConfig, ScoreTransformer
    from smer_music_generation_tpu.train.loss import build_loss_tables, multihead_ce

    rng = np.random.default_rng(0)
    seqs = [rng.integers(2, 300, size=rng.integers(20, 60)) for _ in range(5)]
    group = (seqs, [s[:10] for s in seqs], [s[1:11] for s in seqs])
    batch = collate([group], bucket=128, row_bucket=8, eos_id=vocab.eos_index)
    assert batch["input"].shape[0] == 8  # 5 real rows -> bucket of 8
    # dummy rows: one eos input token, all-pad target_out
    assert (batch["input"][5:, 0] == vocab.eos_index).all()
    assert (batch["input"][5:, 1:] == 0).all()
    assert (batch["target_out"][5:] == 0).all()
    assert not batch["input_pad_mask"][5:, 0].any()

    # numerics: model loss over the bucketed batch equals the loss over
    # only the real rows (dummies contribute zero loss and zero counts)
    cfg = ModelConfig(
        vocab_size=vocab.vocab_size, d_model=32, nhead=4, num_encoder_layers=1,
        num_decoder_layers=1, d_ff=64, max_len=256, dropout=0.0, pos_dropout=0.0,
    )
    model = ScoreTransformer(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
    )
    tables = build_loss_tables(vocab)

    def loss_of(b, rows):
        logits, _ = model.apply(
            params,
            jnp.asarray(b["input"][:rows]),
            jnp.asarray(b["target_in"][:rows]),
            src_pad_mask=jnp.asarray(b["input_pad_mask"][:rows]),
            tgt_pad_mask=jnp.asarray(b["target_pad_mask"][:rows]),
        )
        loss, _ = multihead_ce(
            logits, jnp.asarray(b["target_out"][:rows]), tables, jnp.float32(1.0)
        )
        return float(loss)

    full = loss_of(batch, 8)
    real = loss_of(batch, 5)
    assert np.isfinite(full)
    np.testing.assert_allclose(full, real, rtol=1e-5)


def test_prefetcher_preserves_order_and_errors():
    from smer_music_generation_tpu.data.loader import Prefetcher

    assert list(Prefetcher(iter(range(10)), depth=3)) == list(range(10))
    assert list(Prefetcher(iter([]), depth=1)) == []

    def boom():
        yield 1
        yield 2
        raise RuntimeError("loader died")

    it = iter(Prefetcher(boom(), depth=1))
    assert next(it) == 1 and next(it) == 2
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="loader died"):
        next(it)


def test_prefetcher_close_releases_abandoned_worker():
    import threading

    from smer_music_generation_tpu.data.loader import Prefetcher

    before = threading.active_count()
    pf = Prefetcher(iter(range(100)), depth=1)
    it = iter(pf)
    assert next(it) == 0
    pf.close()  # consumer abandons mid-stream
    pf._thread.join(timeout=5)
    assert not pf._thread.is_alive()
    assert threading.active_count() <= before + 1


def test_prefetcher_close_wakes_blocked_consumer():
    """close() must wake a consumer blocked in get() even at depth=1,
    where a final worker put() used to race the drain-then-sentinel and
    leave the consumer deadlocked."""
    import itertools
    import threading

    from smer_music_generation_tpu.data.loader import Prefetcher

    for _ in range(20):  # the race is timing-dependent; hammer it
        pf = Prefetcher(iter(itertools.count()), depth=1)
        consumed = []

        def consume(pf=pf, consumed=consumed):
            for x in pf:
                consumed.append(x)

        t = threading.Thread(target=consume, daemon=True)
        t.start()
        while not consumed:  # consumer is live and past the first get
            pass
        pf.close()
        t.join(timeout=5)
        assert not t.is_alive(), "consumer deadlocked after close()"
