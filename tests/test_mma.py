"""Monotonic multihead attention baseline tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_caat import W2V_TINY, CAAT_TINY, _rngs
from wav2vec_s_tpu.models.mma import (
    expected_alignment, MMAModel, latency_loss)


import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def test_expected_alignment_properties(rng):
    B, H, U, S = 2, 3, 4, 8
    p = jnp.asarray(rng.uniform(0.1, 0.9, (B, H, U, S)), jnp.float32)
    pad = jnp.zeros((B, S), bool)
    alpha = np.asarray(expected_alignment(p, pad))
    assert alpha.shape == (B, H, U, S)
    assert (alpha >= -1e-6).all()
    # each step's alignment mass is a (sub-)distribution over source
    sums = alpha.sum(-1)
    assert (sums <= 1.0 + 1e-4).all()
    assert (sums > 0.01).all()
    # with p ~ 1 everywhere every step selects immediately at the previous
    # position (monotonic non-decreasing alignment)
    p1 = jnp.full((1, 1, 3, 8), 0.999)
    a1 = np.asarray(expected_alignment(p1, jnp.zeros((1, 8), bool)))
    for u in range(3):
        assert a1[0, 0, u].argmax() == 0
    # with p ~ 0 on the first frames, mass moves past them
    p2 = jnp.full((1, 1, 1, 8), 0.9).at[:, :, :, :4].set(0.001)
    a2 = np.asarray(expected_alignment(p2, jnp.zeros((1, 8), bool)))
    assert a2[0, 0, 0].argmax() == 4


def test_mma_model_forward_and_grads():
    model = MMAModel(W2V_TINY, CAAT_TINY)
    B, S, U = 2, 2400, 4
    src = jax.random.normal(jax.random.PRNGKey(0), (B, S))
    prev = jnp.asarray([[2, 5, 6, 7], [2, 8, 9, 1]], jnp.int32)
    rngs = dict(_rngs(), mono_noise=jax.random.PRNGKey(9))
    variables = model.init(rngs, src, prev, train=False)
    logits, alphas = model.apply(variables, src, prev)
    assert logits.shape == (B, U, CAAT_TINY.vocab_size)
    assert alphas.shape[0] == CAAT_TINY.decoder_layers
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(alphas)).all()

    tgt = jnp.asarray([[5, 6, 7, 2], [8, 9, 2, 1]], jnp.int32)
    src_lens = jnp.asarray([alphas.shape[-1]] * B, jnp.float32)

    def loss_fn(params):
        lg, al = model.apply({"params": params}, src, prev, train=True,
                             rngs={k: v for k, v in rngs.items()
                                   if k != "params"})
        lp = jax.nn.log_softmax(lg, -1)
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        keep = (tgt != CAAT_TINY.pad)
        lat = latency_loss(al, src_lens, ~keep)
        return jnp.sum(nll * keep) / keep.sum() + 0.1 * lat

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # monotonic energy projections receive gradient
    g = grads["layer_0"]["encoder_attn"]["mono_q_proj"]["kernel"]
    assert np.abs(np.asarray(g)).max() > 0


def test_hard_pointers_walk():
    from wav2vec_s_tpu.models.mma import hard_pointers

    B, H, U, S = 1, 2, 3, 8
    p = np.zeros((B, H, U, S), np.float32)
    # head 0: stops at s=2 for u=0, s=5 for u=1, never for u=2
    p[0, 0, 0, 2] = 0.9
    p[0, 0, 1, 1] = 0.9   # before its pointer (2) -> must be skipped
    p[0, 0, 1, 5] = 0.9
    # head 1: stops immediately every step
    p[0, 1, :, 0] = 0.9
    visible = jnp.asarray([6], jnp.int32)
    ptrs, stuck = hard_pointers(jnp.asarray(p), visible,
                                jnp.asarray([False]))
    ptrs, stuck = np.asarray(ptrs), np.asarray(stuck)
    assert ptrs[0, 0, 0] == 2 and not stuck[0, 0, 0]
    assert ptrs[0, 0, 1] == 5 and not stuck[0, 0, 1]   # monotonic skip of s=1
    assert stuck[0, 0, 2]                               # no stop -> READ
    assert (ptrs[0, 1] == 0).all() and not stuck[0, 1].any()
    # stream ended: never stuck, fallback attends the last visible frame
    _, stuck_end = hard_pointers(jnp.asarray(p), visible,
                                 jnp.asarray([True]))
    assert not np.asarray(stuck_end).any()


def _mma_setup():
    from wav2vec_s_tpu.data.dictionary import Dictionary

    model = MMAModel(W2V_TINY, CAAT_TINY)
    src = jax.random.normal(jax.random.PRNGKey(0), (1, 2400))
    prev = jnp.asarray([[2, 5, 6]], jnp.int32)
    rngs = dict(_rngs(), mono_noise=jax.random.PRNGKey(9))
    variables = model.init(rngs, src, prev, train=False)
    vocab = Dictionary()
    for i in range(CAAT_TINY.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    return model, variables["params"], vocab


def test_mma_agent_end_to_end():
    from wav2vec_s_tpu.stream.agent import SimulEvaluator
    from wav2vec_s_tpu.stream.mma_agent import MMAStreamingAgent

    model, params, vocab = _mma_setup()
    buckets = [80 * i for i in range(1, 50)]

    def factory():
        return MMAStreamingAgent(
            model, params, vocab, main_context=4, right_context=2,
            eager=True, max_len=12, audio_buckets=buckets,
            token_buckets=[4, 8, 16])

    ev = SimulEvaluator(factory, segment_size_ms=25)
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(2400).astype(np.float32) * 0.1,
            rng.standard_normal(3200).astype(np.float32) * 0.1]
    refs = ["w1 w2", "w3 w4 w5"]
    out = ev.evaluate(wavs, refs, metric="wer")
    assert out["num_instances"] == 2
    for k in ("AL", "AP", "DAL", "WER"):
        assert np.isfinite(out[k]), out
    r = ev.run_instance(wavs[0], refs[0])
    d = np.asarray(r.delays_ms)
    if len(d):
        assert (np.diff(d) >= 0).all()
        assert d.max() <= r.source_len_ms + 1e-6


def test_mma_agent_reads_when_heads_stuck():
    """With the monotonic energy bias pushed very negative (p < 0.5 on all
    revealed frames) the agent must READ until the stream ends, then emit
    via the end-of-stream fallback."""
    from wav2vec_s_tpu.stream.mma_agent import MMAStreamingAgent

    model, params, vocab = _mma_setup()
    # force p < 0.5 everywhere
    params = jax.tree_util.tree_map(lambda x: x, params)
    for i in range(CAAT_TINY.decoder_layers):
        att = params[f"layer_{i}"]["encoder_attn"]
        att["energy_bias"] = jnp.asarray(-50.0)

    agent = MMAStreamingAgent(
        model, params, vocab, main_context=4, right_context=2, eager=True,
        max_len=8, audio_buckets=[80 * i for i in range(1, 50)],
        token_buckets=[4, 8, 16])
    wav = np.random.default_rng(1).standard_normal(2400).astype(np.float32)
    # open stream: every push must yield zero emissions
    for k in range(0, 2000, 400):
        agent.push(wav[k:k + 400], is_end=False)
        assert agent.pop_word() is None
    agent.push(wav[2000:], is_end=True)
    assert agent.finished
