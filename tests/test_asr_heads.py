"""CTC / seq2seq fine-tune heads + offline generation tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_caat import W2V_TINY, CAAT_TINY, _rngs
from wav2vec_s_tpu.models.asr import (
    Wav2VecCtc, Wav2Vec2Seq2Seq, ctc_loss, ctc_greedy_decode)
from wav2vec_s_tpu.eval.generator import (
    Seq2SeqBeamGenerator, transducer_offline_decode)
from wav2vec_s_tpu.data.dictionary import Dictionary


import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def test_ctc_forward_loss_and_grads():
    model = Wav2VecCtc(W2V_TINY, vocab_size=30)
    B, S = 2, 2400
    src = jax.random.normal(jax.random.PRNGKey(0), (B, S))
    pad = jnp.zeros((B, S), bool).at[1, 2000:].set(True)
    variables = model.init(_rngs(), src, pad, train=False)
    logits, lpad = model.apply(variables, src, pad)
    assert logits.shape[-1] == 30
    assert bool(lpad[1, -1])

    tgt = jnp.asarray([[5, 6, 7], [8, 9, 1]], jnp.int32)  # 1 = pad
    tpad = tgt == 1

    def loss_fn(p):
        lg, lp = model.apply({"params": p}, src, pad)
        return ctc_loss(lg, lp, tgt, tpad) / B

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_ctc_greedy_decode_collapses():
    # blank=0; sequence [0 5 5 0 6] -> [5, 6]
    logits = jnp.full((1, 5, 8), -10.0)
    for t, v in enumerate([0, 5, 5, 0, 6]):
        logits = logits.at[0, t, v].set(10.0)
    pad = jnp.zeros((1, 5), bool)
    assert ctc_greedy_decode(logits, pad) == [[5, 6]]


def test_seq2seq_forward_and_beam():
    model = Wav2Vec2Seq2Seq(W2V_TINY, CAAT_TINY)
    B, S, U = 1, 2400, 4
    src = jax.random.normal(jax.random.PRNGKey(1), (B, S))
    prev = jnp.asarray([[2, 5, 6, 7]], jnp.int32)
    variables = model.init(_rngs(), src, prev, train=False)
    logits = model.apply(variables, src, prev)
    assert logits.shape == (B, U, CAAT_TINY.vocab_size)

    vocab = Dictionary()
    for i in range(CAAT_TINY.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    gen = Seq2SeqBeamGenerator(model, variables["params"], vocab,
                               beam_size=3, max_len_b=8)
    hypos = gen.generate(np.asarray(src))
    assert len(hypos) >= 1
    assert all(np.isfinite(h.score) for h in hypos)
    assert all(vocab.eos() not in h.tokens for h in hypos)
    # beams sorted by score
    assert all(hypos[i].score >= hypos[i + 1].score
               for i in range(len(hypos) - 1))


def test_two_stage_joint_generator():
    """StageGenerator twin: stage-1 ASR beam feeds a joint stage-2 beam.

    The mt scorer here conditions on each beam slot's transcript via the
    seq2seq decoder over transcript embeddings (enough to pin the joint
    mechanics: slot carrying, score carryover, combined-length norm)."""
    from wav2vec_s_tpu.eval.generator import TwoStageJointGenerator

    model = Wav2Vec2Seq2Seq(W2V_TINY, CAAT_TINY)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, 2400))
    prev = jnp.asarray([[2, 5, 6, 7]], jnp.int32)
    variables = model.init(_rngs(), src, prev, train=False)
    params = variables["params"]
    vocab = Dictionary()
    for i in range(CAAT_TINY.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    asr_gen = Seq2SeqBeamGenerator(model, params, vocab, beam_size=3,
                                   max_len_b=6)

    embed = np.asarray(params["embed_tokens"]
                       if "embed_tokens" in params else
                       params["decoder"]["embed_tokens"])

    def mt_score_fn(asr_tokens, prev_mt, lens):
        enc = jnp.asarray(embed)[np.asarray(asr_tokens)]
        enc_pad = jnp.asarray(asr_tokens == vocab.pad())
        logits = model.apply({"params": params}, jnp.asarray(prev_mt), enc,
                             enc_pad, method=Wav2Vec2Seq2Seq.decode_logits)
        k = jnp.arange(prev_mt.shape[0])
        return jax.nn.log_softmax(logits[k, jnp.asarray(lens) - 1], -1)

    gen = TwoStageJointGenerator(asr_gen.generate, mt_score_fn, vocab,
                                 beam_size=3, max_len=6)
    out = gen.generate(np.asarray(src))
    assert out, "no joint hypotheses"
    assert all(np.isfinite(f["score"]) for f in out)
    assert all(out[i]["score"] >= out[i + 1]["score"]
               for i in range(len(out) - 1))
    asr_set = {tuple(h.tokens) for h in asr_gen.generate(np.asarray(src))}
    assert all(tuple(f["asr_tokens"]) in asr_set for f in out)

    # asr_1best: every joint hypothesis conditions on the best transcript
    gen1 = TwoStageJointGenerator(asr_gen.generate, mt_score_fn, vocab,
                                  beam_size=3, max_len=6, asr_1best=True)
    out1 = gen1.generate(np.asarray(src))
    best = asr_gen.generate(np.asarray(src))[0].tokens
    assert all(f["asr_tokens"] == best for f in out1)


def test_transducer_offline_decode_runs():
    from tests.test_streaming import _tiny_caat
    from wav2vec_s_tpu.stream.engine import StreamingEngine
    from wav2vec_s_tpu.stream.searcher import StreamingTransducerSearcher

    model, params, caat = _tiny_caat()
    vocab = Dictionary()
    for i in range(caat.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    engine = StreamingEngine(model, params, 4, 2,
                             audio_buckets=[1280 * i for i in range(1, 20)],
                             token_buckets=[8, 16])
    searcher = StreamingTransducerSearcher(engine, vocab)
    wav = np.random.default_rng(0).standard_normal(6400).astype(np.float32)
    out = transducer_offline_decode(searcher, wav, intra_beam=3, max_steps=6)
    assert isinstance(out, str)
