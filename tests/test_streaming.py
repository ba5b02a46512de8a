"""Streaming stack tests: latency metrics, scoring, decode-step parity,
and an end-to-end simultaneous evaluation on a tiny model."""

import numpy as np
import jax
import jax.numpy as jnp

from wav2vec_s_tpu.stream.latency import (
    average_lagging, average_proportion, differentiable_average_lagging)
from wav2vec_s_tpu.eval import wer, corpus_wer, corpus_bleu


import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def test_latency_hand_values():
    # wait-1 policy on equal lengths: delays = [1, 2, 3], |x| = 3
    assert abs(average_proportion([1, 2, 3], 3) - (6 / 9)) < 1e-9
    # AL: oracle = [0, 1, 2], no saturation before last -> mask = [F, F, T]
    # lagging = [1, 1, 0(masked)] -> tau=2 -> AL = 1
    assert abs(average_lagging([1, 2, 3], 3) - 1.0) < 1e-9
    # DAL with gamma=1: new_delays=[1,2,3], minus [0,1,2] -> 1 each -> 1.0
    assert abs(differentiable_average_lagging([1, 2, 3], 3) - 1.0) < 1e-9
    # full-wait policy: all delays = |x|
    assert abs(average_proportion([3, 3, 3], 3) - 1.0) < 1e-9
    al = average_lagging([3, 3, 3], 3)
    assert abs(al - 3.0) < 1e-9  # only first step counts: 3 - 0


def test_wer_values():
    assert wer("a b c", "a b c") == 0.0
    assert abs(wer("a x c", "a b c") - 1 / 3) < 1e-9
    assert corpus_wer(["a b", "c"], ["a b", "c d"]) == 25.0  # 1 err / 4 words


def test_bleu_sane():
    b = corpus_bleu(["the cat sat on the mat there"],
                    ["the cat sat on the mat here"])
    assert 30 < b < 100
    assert corpus_bleu(["x y z w"], ["a b c d"]) == 0.0


def _tiny_caat():
    from tests.test_caat import W2V_TINY, CAAT_TINY, _rngs
    from wav2vec_s_tpu.models.caat import W2V2CaatModel
    model = W2V2CaatModel(W2V_TINY, CAAT_TINY)
    B, S, U = 1, 2400, 4
    src = jax.random.normal(jax.random.PRNGKey(1), (B, S))
    tgt = jax.random.randint(jax.random.PRNGKey(2), (B, U), 4, 30)
    prev = jnp.concatenate(
        [jnp.full((B, 1), CAAT_TINY.bos, tgt.dtype), tgt], 1)
    variables = model.init(_rngs(), src, prev, train=False)
    return model, variables["params"], CAAT_TINY


def test_decode_step_matches_offline_joint():
    """decode_step (streaming scoring) must agree with the training-path
    jointer in single-group mode at the last token position."""
    model, params, caat = _tiny_caat()
    S = 2400
    src = jax.random.normal(jax.random.PRNGKey(5), (1, S))
    prev = jnp.asarray([[caat.bos, 7, 9]], jnp.int32)

    joint_h, _ = model.apply({"params": params}, src, prev, downsample=-1,
                             train=False)
    logits = model.apply({"params": params}, joint_h,
                         method=type(model).output_logits)
    want = np.asarray(jax.nn.log_softmax(logits[0, 0, -1]))

    enc, enc_pad = model.apply({"params": params}, src,
                               method=type(model).encode)
    got = model.apply(
        {"params": params}, prev, jnp.asarray([3]), enc,
        jnp.zeros(enc.shape[:2], bool), method=type(model).decode_step)
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=2e-5)


def test_streaming_end_to_end():
    from wav2vec_s_tpu.data.dictionary import Dictionary
    from wav2vec_s_tpu.stream.engine import StreamingEngine
    from wav2vec_s_tpu.stream.searcher import StreamingTransducerSearcher
    from wav2vec_s_tpu.stream.agent import (
        AgentConfig, SpeechTransducerAgent, SimulEvaluator)

    model, params, caat = _tiny_caat()
    vocab = Dictionary()
    for i in range(caat.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    engine = StreamingEngine(model, params, main_context=4, right_context=2,
                             audio_buckets=[1280 * i for i in range(1, 40)],
                             token_buckets=[8, 16, 32])
    searcher = StreamingTransducerSearcher(engine, vocab)
    cfg = AgentConfig(main_context=4, right_context=2, step_read_blocks=1,
                      intra_beam=3, inter_beam=1, gen_beam=2.0,
                      decoder_step_read=4, eager=True, max_len_a=0.01,
                      max_len_b=-2, len_scale=1.0)
    ev = SimulEvaluator(lambda: SpeechTransducerAgent(searcher, cfg),
                        segment_size_ms=25)

    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(9600).astype(np.float32) * 0.1,
            rng.standard_normal(12800).astype(np.float32) * 0.1]
    refs = ["w1 w2 w3", "w4 w5"]
    out = ev.evaluate(wavs, refs, metric="wer")
    assert out["num_instances"] == 2
    for k in ("AL", "AP", "DAL", "AL_CA", "WER"):
        assert np.isfinite(out[k]), out
    # delays must be within the source duration and non-decreasing
    r = ev.run_instance(wavs[0], refs[0])
    d = np.asarray(r.delays_ms)
    if len(d):
        assert (np.diff(d) >= 0).all()
        assert d.max() <= r.source_len_ms + 1e-6


def test_ensemble_engine_matches_single():
    from wav2vec_s_tpu.data.dictionary import Dictionary
    from wav2vec_s_tpu.stream.engine import StreamingEngine, EnsembleEngine

    model, params, caat = _tiny_caat()
    kw = dict(main_context=4, right_context=2,
              audio_buckets=[1280 * i for i in range(1, 10)],
              token_buckets=[8])
    e1 = StreamingEngine(model, params, **kw)
    ens = EnsembleEngine([StreamingEngine(model, params, **kw),
                          StreamingEngine(model, params, **kw)])
    wav = np.random.default_rng(0).standard_normal(3840).astype(np.float32)
    enc1, t1 = e1.encode_prefix(wav, False)
    encs, t2 = ens.encode_prefix(wav, False)
    assert t1 == t2 and len(encs) == 2
    prefixes = np.asarray([[0, 7]], np.int32)
    lens = np.asarray([2])
    s1 = e1.decode_scores(prefixes, lens, enc1, t1)
    s2 = ens.decode_scores(prefixes, lens, encs, t2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)
