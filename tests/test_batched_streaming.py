"""Batched multi-stream greedy decoding tests."""

import numpy as np
import jax

from tests.test_streaming import _tiny_caat
from wav2vec_s_tpu.data.dictionary import Dictionary
from wav2vec_s_tpu.stream.batched import BatchedGreedyStreamingDecoder


import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def _setup(max_emit=4):
    model, params, caat = _tiny_caat()
    vocab = Dictionary()
    for i in range(caat.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    dec = BatchedGreedyStreamingDecoder(
        model, params, vocab, main_context=4, right_context=2,
        max_len=12, max_emit_per_chunk=max_emit,
        audio_buckets=[1280 * i for i in range(1, 20)])
    return dec, vocab


def test_batched_greedy_runs_and_is_stream_consistent():
    dec, vocab = _setup()
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(9600).astype(np.float32) * 0.1,
            rng.standard_normal(6400).astype(np.float32) * 0.1,
            rng.standard_normal(12800).astype(np.float32) * 0.1]
    texts, delays = dec.decode_corpus(wavs)
    assert len(texts) == 3
    for i, d in enumerate(delays):
        dur = len(wavs[i]) / 16.0
        assert all(0 < x <= dur + 1e-6 for x in d)
        assert d == sorted(d)

    # batching must not change results: decode stream 0 alone
    t_single, _ = dec.decode_corpus(wavs[:1])
    assert t_single[0] == texts[0]


def test_batched_greedy_respects_max_len():
    dec, vocab = _setup(max_emit=8)
    dec.max_len = 3
    rng = np.random.default_rng(1)
    wavs = [rng.standard_normal(6400).astype(np.float32) * 0.5]
    texts, delays = dec.decode_corpus(wavs)
    assert len(delays[0]) <= 3


def test_incremental_greedy_matches_full_encode_oracle():
    """The O(T) incremental path must emit exactly what a greedy decode over
    the one-shot full-audio blockwise encode emits at the same reveal
    schedule (visible = (k+1)*mc frames per chunk, all frames at flush)."""
    import jax.numpy as jnp
    from tests.test_caat import W2V_TINY
    from wav2vec_s_tpu.stream.batched import IncrementalGreedyDecoder

    dec, vocab = _setup(max_emit=4)
    model, params = dec.model, dec.params
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(9600).astype(np.float32) * 0.1,
            rng.standard_normal(9600).astype(np.float32) * 0.1]

    inc = IncrementalGreedyDecoder(model, params, vocab, W2V_TINY,
                                   max_len=12, max_emit_per_chunk=4,
                                   t_cap=64)
    got_texts, delays = inc.decode_corpus(wavs)
    for d in delays:
        assert d == sorted(d)

    # oracle: full encode once, same greedy policy + reveal schedule
    mc, rc = W2V_TINY.main_context, W2V_TINY.right_context
    N = len(wavs)
    audio = jnp.asarray(np.stack(wavs))
    enc, _ = model.apply({"params": params}, audio,
                         method=type(model).encode,
                         main_context=mc, right_context=rc)
    T = enc.shape[1]
    hop, rf = inc._enc_factory(1).hop, inc._enc_factory(1).rf
    total_frames = (len(wavs[0]) - rf) // hop + 1
    n_chunks = max((total_frames - rc) // mc, 1)
    prefixes = np.full((N, 13), vocab.pad(), np.int32)
    prefixes[:, 0] = vocab.bos()
    lens = np.ones(N, np.int32)
    for k in range(n_chunks):
        visible = min((k + 1) * mc, total_frames)
        if k == n_chunks - 1:
            visible = min(visible + rc, total_frames)
        mask = np.arange(T)[None, :] >= visible
        mask = np.repeat(mask, N, 0)
        blocked = np.zeros(N, bool)
        for _ in range(4):
            lp = np.array(model.apply(
                {"params": params}, jnp.asarray(prefixes),
                jnp.asarray(lens), enc, jnp.asarray(mask),
                method=type(model).decode_step))
            lp[:, vocab.pad()] = -np.inf
            toks = lp.argmax(-1)
            for i in range(N):
                emit = (not blocked[i]) and toks[i] != vocab.bos() \
                    and lens[i] < 12
                if emit:
                    prefixes[i, lens[i]] = toks[i]
                    lens[i] += 1
                else:
                    blocked[i] = True
            if blocked.all():
                break
    oracle = []
    for i in range(N):
        pieces = [vocab[int(x)] for x in prefixes[i, 1:lens[i]]
                  if int(x) >= vocab.nspecial]
        oracle.append("".join(pieces).replace("▁", " ").strip())
    assert got_texts == oracle


def test_fused_matches_unfused_incremental():
    from tests.test_caat import W2V_TINY
    from wav2vec_s_tpu.stream.batched import (
        IncrementalGreedyDecoder, FusedIncrementalGreedyDecoder)

    dec, vocab = _setup(max_emit=4)
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(9600).astype(np.float32) * 0.1,
            rng.standard_normal(9600).astype(np.float32) * 0.1]
    kw = dict(max_len=12, max_emit_per_chunk=4, t_cap=64)
    a = IncrementalGreedyDecoder(dec.model, dec.params, vocab, W2V_TINY, **kw)
    b = FusedIncrementalGreedyDecoder(dec.model, dec.params, vocab,
                                      W2V_TINY, **kw)
    ta, da = a.decode_corpus(wavs)
    tb, db = b.decode_corpus(wavs)
    assert ta == tb
    assert [len(x) for x in da] == [len(x) for x in db]


def test_cached_fused_matches_fused():
    from tests.test_caat import W2V_TINY
    from wav2vec_s_tpu.stream.batched import (
        FusedIncrementalGreedyDecoder, CachedFusedGreedyDecoder)

    dec, vocab = _setup(max_emit=4)
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(9600).astype(np.float32) * 0.1,
            rng.standard_normal(9600).astype(np.float32) * 0.1]
    kw = dict(max_len=12, max_emit_per_chunk=4, t_cap=64)
    a = FusedIncrementalGreedyDecoder(dec.model, dec.params, vocab,
                                      W2V_TINY, **kw)
    b = CachedFusedGreedyDecoder(dec.model, dec.params, vocab,
                                 W2V_TINY, **kw)
    ta, da = a.decode_corpus(wavs)
    tb, db = b.decode_corpus(wavs)
    assert ta == tb
    assert da == db
