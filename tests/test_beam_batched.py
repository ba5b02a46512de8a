"""Batched beam streaming decoder: equivalence vs the host searcher.

The device-batched beam kernel (stream/beam_batched.py) must reproduce the
single-stream host beam search (stream/searcher.py, itself the behavioral
twin of rain/simul/transducer_searcher.py) chunk-for-chunk: same emitted
words, same final text — for multiple streams decoded in lockstep.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_caat import W2V_TINY, CAAT_TINY, _rngs
from wav2vec_s_tpu.data.dictionary import Dictionary
from wav2vec_s_tpu.models.caat import W2V2CaatModel
from wav2vec_s_tpu.models.feature_extractor import (
    conv_output_length, conv_receptive_stride)
from wav2vec_s_tpu.stream.beam_batched import BatchedBeamStreamingDecoder
from wav2vec_s_tpu.stream.engine import StreamingEngine
from wav2vec_s_tpu.stream.searcher import StreamingTransducerSearcher


import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def _setup():
    model = W2V2CaatModel(W2V_TINY, CAAT_TINY)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, 2400))
    prev = jnp.asarray([[CAAT_TINY.bos, 5, 6, 7, 8]], jnp.int32)
    variables = model.init(_rngs(), src, prev, train=False)
    vocab = Dictionary()
    for i in range(CAAT_TINY.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    return model, variables["params"], vocab


def test_jointer_step_beam_matches_flat():
    """Beam-shaped jointer step == per-beam flat jointer step."""
    from wav2vec_s_tpu.stream import caat_step

    model, params, vocab = _setup()
    caat = CAAT_TINY
    N, B, T = 2, 3, 8
    D = caat.jointer_embed_dim
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((N, B, D)), jnp.float32)
    # caches are time-major [T, N, D]
    jk = tuple(jnp.asarray(rng.standard_normal((T, N, D)), jnp.float32)
               for _ in range(caat.jointer_layers))
    jv = tuple(jnp.asarray(rng.standard_normal((T, N, D)), jnp.float32)
               for _ in range(caat.jointer_layers))
    visible = jnp.asarray([5, 8], jnp.int32)

    got = caat_step.jointer_step_beam(params, caat, h, jk, jv, visible)
    # flat reference: tile caches per beam along the stream axis
    jk_f = tuple(jnp.repeat(k, B, axis=1) for k in jk)
    jv_f = tuple(jnp.repeat(v, B, axis=1) for v in jv)
    want = caat_step.jointer_step(
        params, caat, h.reshape(N * B, D), jk_f, jv_f,
        jnp.repeat(visible, B))
    np.testing.assert_allclose(np.asarray(got).reshape(N * B, -1),
                               np.asarray(want), atol=1e-5)


def _chunked_audio(n_chunks, seed):
    """Audio whose length lands exactly on the chunk grid."""
    rf, hop = conv_receptive_stride(W2V_TINY.conv_feature_layers)
    mc, rc = W2V_TINY.main_context, W2V_TINY.right_context
    n = (n_chunks * mc + rc - 1) * hop + rf
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def _host_decode(model, params, vocab, wav, beam, max_steps, gen_beam,
                 eager):
    """Drive the host searcher on the same chunk grid."""
    rf, hop = conv_receptive_stride(W2V_TINY.conv_feature_layers)
    mc, rc = W2V_TINY.main_context, W2V_TINY.right_context
    window = (mc + rc - 1) * hop + rf
    stride = mc * hop
    n_chunks = (conv_output_length(len(wav), W2V_TINY.conv_feature_layers)
                - rc) // mc
    prefix_lens = [min(k * stride + window, len(wav))
                   for k in range(n_chunks)]
    engine = StreamingEngine(model, params, main_context=mc,
                             right_context=rc,
                             audio_buckets=sorted(set(prefix_lens)),
                             token_buckets=[8, 16, 32, 64])
    searcher = StreamingTransducerSearcher(engine, vocab, eager=eager)
    state = searcher.init_state()
    words, delays = [], []
    for k, plen in enumerate(prefix_lens):
        is_end = k == n_chunks - 1
        state, ws = searcher.search(state, wav[:plen], is_end,
                                    intra_beam=beam, inter_beam=1,
                                    gen_beam=gen_beam, read_step=mc,
                                    max_steps=max_steps)
        words.extend(ws)
    return words


def test_batched_beam_matches_host_searcher():
    model, params, vocab = _setup()
    beam, max_steps, gen_beam = 3, 5, 2.0

    wavs = [_chunked_audio(4, seed) for seed in (0, 7)]
    dec = BatchedBeamStreamingDecoder(
        model, params, vocab, W2V_TINY, beam_size=beam, inter_beam=1,
        gen_beam=gen_beam, max_steps=max_steps, max_len=64, eager=True,
        t_cap=64)
    texts, delays = dec.decode_corpus(wavs)

    for wav, text, dl in zip(wavs, texts, delays):
        want = _host_decode(model, params, vocab, wav, beam, max_steps,
                            gen_beam, eager=True)
        assert text.split() == want, (text, want)
        assert len(dl) == len(text.split())
        if dl:
            assert (np.diff(dl) >= 0).all()
            assert max(dl) <= len(wav) / 16.0 + 1e-6


def test_batched_beam_word_gated_emission():
    """Non-eager mode: emitted words must be a prefix of the eager output
    and only complete words are emitted before the stream ends."""
    model, params, vocab = _setup()
    wavs = [_chunked_audio(4, 3)]
    kw = dict(beam_size=3, inter_beam=1, gen_beam=2.0, max_steps=5,
              max_len=64, t_cap=64)
    eager = BatchedBeamStreamingDecoder(model, params, vocab, W2V_TINY,
                                        eager=True, **kw)
    gated = BatchedBeamStreamingDecoder(model, params, vocab, W2V_TINY,
                                        eager=False, **kw)
    t_eager, _ = eager.decode_corpus(wavs)
    t_gated, _ = gated.decode_corpus(wavs)
    # same token stream; whitespace grouping may differ because emission
    # timing differs (host searcher behaves identically for word vocabs)
    assert "".join(t_eager[0].split()) == "".join(t_gated[0].split())


def test_oneshot_beam_matches_incremental_beam():
    """One-shot corpus beam (full encode + interleaved halves) must emit
    exactly what the incremental batched beam decoder emits."""
    from wav2vec_s_tpu.stream.beam_batched import OneShotBeamDecoder

    model, params, vocab = _setup()
    kw = dict(beam_size=3, inter_beam=1, gen_beam=2.0, max_steps=5,
              max_len=64, eager=True, t_cap=64)
    # four streams of two different lengths -> both interleave halves run
    # and per-stream is_end/visible schedules diverge
    wavs = [_chunked_audio(4, 0), _chunked_audio(3, 7),
            _chunked_audio(4, 5), _chunked_audio(2, 9)]
    a = BatchedBeamStreamingDecoder(model, params, vocab, W2V_TINY, **kw)
    b = OneShotBeamDecoder(model, params, vocab, W2V_TINY, **kw)
    ta, da = a.decode_corpus(wavs)
    tb, db = b.decode_corpus(wavs)
    assert ta == tb
    assert da == db


def test_fused_beam_matches_oneshot_beam():
    """The fully-fused beam path (device-side argmax re-seed + host replay
    of the LCP emission, zero per-chunk syncs) must emit exactly what the
    per-chunk host-merged one-shot beam decoder emits — texts AND delays —
    at the inter_beam=1 / merge_add=False operating point, including
    mixed-length corpora (divergent is_end / run schedules) and the
    word-boundary-gated (non-eager) emission mode."""
    from wav2vec_s_tpu.stream.beam_batched import (
        FusedBeamStreamingDecoder, FusedOneShotBeamDecoder,
        OneShotBeamDecoder)

    model, params, vocab = _setup()
    wavs = [_chunked_audio(4, 0), _chunked_audio(3, 7),
            _chunked_audio(4, 5), _chunked_audio(2, 9)]
    for eager in (True, False):
        kw = dict(beam_size=3, inter_beam=1, gen_beam=2.0, max_steps=5,
                  max_len=64, eager=eager, t_cap=64)
        a = OneShotBeamDecoder(model, params, vocab, W2V_TINY, **kw)
        b = FusedOneShotBeamDecoder(model, params, vocab, W2V_TINY, **kw)
        c = FusedBeamStreamingDecoder(model, params, vocab, W2V_TINY, **kw)
        ta, da = a.decode_corpus(wavs)
        tb, db = b.decode_corpus(wavs)
        tc, dc = c.decode_corpus(wavs)
        assert ta == tb == tc, (eager, ta, tb, tc)
        assert da == db == dc
