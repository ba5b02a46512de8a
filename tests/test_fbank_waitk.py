"""fbank CAAT family + wait-k baseline tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_caat import W2V_TINY, CAAT_TINY, _rngs
from wav2vec_s_tpu.models.fbank import (
    Shallow2dConv, Vgg2dConv, FbankBlockwiseEncoder, FbankCaatModel)
from wav2vec_s_tpu.models.waitk import (
    waitk_cross_bias, WaitkModel, WaitkAgent)
from wav2vec_s_tpu.models.caat.transducer_model import caat_loss

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


ENC_TINY = dataclasses.replace(W2V_TINY)  # reuse encoder hyperparams


def test_conv_frontends_downsample_4x():
    feats = jnp.zeros((2, 40, 80))
    for cls in (Shallow2dConv, Vgg2dConv):
        mod = cls(out_dim=24)
        p = mod.init(jax.random.PRNGKey(0), feats)
        y = mod.apply(p, feats)
        assert y.shape == (2, 10, 24)


@pytest.mark.parametrize("jointer", ["mha", "concat", "attention"])
def test_fbank_caat_forward_and_loss(jointer):
    model = FbankCaatModel(ENC_TINY, CAAT_TINY, jointer_type=jointer)
    B, T, U = 2, 64, 4
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, 80))
    tgt = jax.random.randint(jax.random.PRNGKey(1), (B, U), 4, 30)
    prev = jnp.concatenate(
        [jnp.full((B, 1), CAAT_TINY.bos, tgt.dtype), tgt], 1)
    variables = model.init(_rngs(), feats, prev, train=False)
    joint, glens = model.apply(variables, feats, prev, downsample=4,
                               train=False)
    assert joint.shape[0] == B and joint.shape[2] == U + 1
    tgt_lens = jnp.sum(tgt != CAAT_TINY.pad, 1).astype(jnp.int32)
    loss, logs = caat_loss(joint, variables["params"]["embed_tokens"],
                           tgt, glens, tgt_lens, CAAT_TINY)
    assert np.isfinite(float(loss))


def test_waitk_bias():
    b = np.asarray(waitk_cross_bias(4, 10, k=2, stride=2))
    # step 0 sees frames < 4; step 1 < 6
    assert (b[0, :4] == 0).all() and (b[0, 4:] < -1e3).all()
    assert (b[1, :6] == 0).all() and (b[1, 6:] < -1e3).all()


def test_waitk_model_and_agent():
    model = WaitkModel(W2V_TINY, CAAT_TINY, waitk=1, stride=4)
    B, S = 1, 2400
    src = jax.random.normal(jax.random.PRNGKey(2), (B, S))
    prev = jnp.asarray([[2, 5, 6]], jnp.int32)
    variables = model.init(_rngs(), src, prev, train=False)
    logits = model.apply(variables, src, prev)
    assert logits.shape == (B, 3, CAAT_TINY.vocab_size)

    from wav2vec_s_tpu.data.dictionary import Dictionary
    vocab = Dictionary()
    for i in range(CAAT_TINY.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    agent = WaitkAgent(model, variables["params"], vocab, waitk=1, stride=4,
                       max_len=6)
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(4800).astype(np.float32) * 0.1
    for i in range(0, 4800, 1600):
        agent.push(wav[i:i + 1600], is_end=(i + 1600 >= 4800))
    assert agent.finished
    words = []
    while True:
        w = agent.pop_word()
        if w is None:
            break
        words.append(w)
    assert len(words) <= 6
