"""Continuous-batching serving == the wave-synchronous corpus decoder.

Streams that join mid-session, stall, and finish independently must each
decode EXACTLY as if they were the only stream in a
``CachedFusedGreedyDecoder`` batch — the per-slot visibility plane and
slot-local positions make the multiplexing invisible to the math.
"""

import numpy as np
import pytest

from tests.test_streaming import _tiny_caat
from tests.test_caat import W2V_TINY
from wav2vec_s_tpu.data.dictionary import Dictionary
from wav2vec_s_tpu.stream.batched import CachedFusedGreedyDecoder
from wav2vec_s_tpu.stream.serving import ServingSession


pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


@pytest.fixture(scope="module")
def setup():
    model, params, caat = _tiny_caat()
    vocab = Dictionary()
    for i in range(caat.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    # W2V_TINY's conv hop is 20 samples (strides 5*2*2), so these lengths
    # are 29/22/17 frames -> 6/5/3 chunks of (mc=4 frames, rc=2): big
    # enough to stagger, small enough for every capacity below
    rng = np.random.default_rng(7)
    wavs = {
        "s0": rng.standard_normal(600).astype(np.float32) * 0.1,
        "s1": rng.standard_normal(450).astype(np.float32) * 0.1,
        "s2": rng.standard_normal(350).astype(np.float32) * 0.1,
    }
    kw = dict(max_len=12, max_emit_per_chunk=4, t_cap=128,
              blocks_per_step=1)
    oracle = CachedFusedGreedyDecoder(model, params, vocab, W2V_TINY, **kw)
    want = {}
    for sid, wav in wavs.items():
        texts, delays = oracle.decode_corpus([wav])
        want[sid] = (texts[0], delays[0])
    return dict(model=model, params=params, vocab=vocab, wavs=wavs,
                want=want)


def test_continuous_batching_matches_single_stream_oracle(setup):
    """Staggered joins + a mid-stream stall + slot recycling (3 streams on
    2 slots): every stream's text AND delays match its solo decode."""
    sess = ServingSession(setup["model"], setup["params"], setup["vocab"],
                          W2V_TINY, n_slots=2, t_cap=256,
                          blocks_per_step=1, max_len=12,
                          max_emit_per_chunk=4)
    wavs = setup["wavs"]

    assert sess.add_stream("s0")
    sess.push("s0", wavs["s0"], is_end=True)
    assert sess.add_stream("s1")
    sess.push("s1", wavs["s1"][:200])         # covers chunk 0 only: stalls
    assert not sess.add_stream("s2")          # both slots busy

    added_s2 = False
    pushed_s1_rest = False
    for it in range(100):
        sess.step()
        if not pushed_s1_rest and it >= 3:
            # s1 sat stalled (no new audio) for several steps while s0
            # kept decoding — now feed the rest
            sess.push("s1", wavs["s1"][200:], is_end=True)
            pushed_s1_rest = True
        if not added_s2 and "s0" in sess._results:
            assert sess.add_stream("s2")      # recycled slot
            sess.push("s2", wavs["s2"], is_end=True)
            added_s2 = True
        if len(sess._results) == 3:
            break
    assert len(sess._results) == 3
    for sid in ("s0", "s1", "s2"):
        text, delays = sess.result(sid)
        assert text == setup["want"][sid][0], sid
        assert delays == setup["want"][sid][1], sid


def test_compaction_preserves_results(setup):
    """A t_cap too small for the whole session forces cache compaction
    mid-run; results must be unchanged."""
    sess = ServingSession(setup["model"], setup["params"], setup["vocab"],
                          W2V_TINY, n_slots=1, t_cap=64,
                          blocks_per_step=1, max_len=12,
                          max_emit_per_chunk=4)
    wavs = setup["wavs"]
    # sequential streams: 2 x 6+ chunks x 6 rows > 64 -> compaction fires
    for sid in ("s0", "s1"):
        assert sess.add_stream(sid)
        sess.push(sid, wavs[sid], is_end=True)
        sess.drain()
        text, delays = sess.result(sid)
        assert text == setup["want"][sid][0], sid
        assert delays == setup["want"][sid][1], sid


def test_capacity_exhaustion_raises(setup):
    """A single stream longer than t_cap cannot compact (its own rows are
    live) and must fail loudly, not corrupt."""
    sess = ServingSession(setup["model"], setup["params"], setup["vocab"],
                          W2V_TINY, n_slots=1, t_cap=24,
                          blocks_per_step=1, max_len=12,
                          max_emit_per_chunk=4)
    assert sess.add_stream("long")
    sess.push("long", setup["wavs"]["s0"], is_end=True)
    with pytest.raises(RuntimeError, match="t_cap"):
        sess.drain()


def test_lockstep_batch_matches_oracle(setup):
    """All streams admitted together (the corpus-decoder regime) still
    match — the degenerate case of continuous batching."""
    sess = ServingSession(setup["model"], setup["params"], setup["vocab"],
                          W2V_TINY, n_slots=3, t_cap=256,
                          blocks_per_step=1, max_len=12,
                          max_emit_per_chunk=4)
    for sid, wav in setup["wavs"].items():
        assert sess.add_stream(sid)
        sess.push(sid, wav, is_end=True)
    sess.drain()
    for sid in setup["wavs"]:
        text, delays = sess.result(sid)
        assert text == setup["want"][sid][0], sid
        assert delays == setup["want"][sid][1], sid
