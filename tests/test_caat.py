"""CAAT model + loss tests on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np

from wav2vec_s_tpu.models import Wav2Vec2Config
from wav2vec_s_tpu.models.caat import (
    CaatConfig, W2V2CaatModel, caat_loss, group_attn_bias, num_groups)
from wav2vec_s_tpu.models.caat.transducer_model import label_smoothed_ce

W2V_TINY = Wav2Vec2Config(
    conv_feature_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
    encoder_layers=2, encoder_embed_dim=24, encoder_ffn_embed_dim=48,
    encoder_attention_heads=4, final_dim=16, encoder_layerdrop=0.0,
    main_context=4, right_context=2, feature_grad_mult=1.0)

import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


CAAT_TINY = CaatConfig(
    vocab_size=30, decoder_layers=2, decoder_embed_dim=24,
    decoder_ffn_embed_dim=48, decoder_attention_heads=4,
    jointer_layers=2, jointer_embed_dim=24, jointer_ffn_embed_dim=48,
    jointer_attention_heads=4, transducer_downsample=8,
    tokens_per_step=200, dropout=0.0, attention_dropout=0.0,
    activation_dropout=0.0)


def _rngs():
    k = jax.random.PRNGKey(0)
    names = ["params", "dropout", "gumbel", "negatives", "layerdrop",
             "rand_pos"]
    return dict(zip(names, jax.random.split(k, len(names))))


def _setup(B=2, S=2400, U=5):
    model = W2V2CaatModel(W2V_TINY, CAAT_TINY)
    src = jax.random.normal(jax.random.PRNGKey(1), (B, S))
    tgt = jax.random.randint(jax.random.PRNGKey(2), (B, U), 4, 30)
    tgt = tgt.at[1, 3:].set(CAAT_TINY.pad)  # second row shorter
    prev = jnp.concatenate(
        [jnp.full((B, 1), CAAT_TINY.bos, dtype=tgt.dtype), tgt], axis=1)
    variables = model.init(_rngs(), src, prev, train=False)
    return model, variables, src, tgt, prev


def test_group_bias():
    b = np.asarray(group_attn_bias(10, 4))
    assert b.shape == (1, 3, 10)
    assert (b[0, 0, :4] == 0).all() and (b[0, 0, 4:] < -1e3).all()
    assert (b[0, 2] == 0).all()
    assert num_groups(10, 4) == 3


def test_caat_forward_shapes():
    model, variables, src, tgt, prev = _setup()
    joint_h, glens = model.apply(variables, src, prev, train=False)
    B, U1 = prev.shape
    T = joint_h.shape[1]
    assert joint_h.shape[0] == B and joint_h.shape[2] == U1
    assert joint_h.shape[3] == CAAT_TINY.decoder_embed_dim
    assert np.isfinite(np.asarray(joint_h)).all()
    from wav2vec_s_tpu.models.feature_extractor import conv_output_length
    frames = conv_output_length(2400, W2V_TINY.conv_feature_layers)
    assert T == -(-frames // CAAT_TINY.transducer_downsample)
    assert np.asarray(glens).max() <= T


def test_caat_loss_and_grads():
    model, variables, src, tgt, prev = _setup()

    def loss_fn(params):
        joint_h, glens = model.apply({"params": params}, src, prev,
                                     train=False)
        tgt_lens = jnp.sum(tgt != CAAT_TINY.pad, axis=1).astype(jnp.int32)
        loss, logs = caat_loss(joint_h, params["embed_tokens"], tgt, glens,
                               tgt_lens, CAAT_TINY)
        return loss / jnp.maximum(logs["sample_size"], 1), logs

    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    assert float(logs["loss_prob"]) > 0
    assert float(logs["loss_delay"]) >= 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # both encoder and decoder get gradient
    g_enc = grads["encoder"]["encoder"]["layers"]["layer_0"]["self_attn"]["q_proj"]["kernel"]
    g_dec = grads["decoder_lm"]["layer_0"]["self_attn"]["q_proj"]["kernel"]
    g_emb = grads["embed_tokens"]
    for g in (g_enc, g_dec, g_emb):
        assert np.abs(np.asarray(g)).max() > 0


def test_chunking_invariance():
    """tokens_per_step must not change the loss value (only memory shape)."""
    model, variables, src, tgt, prev = _setup(B=3)
    joint_h, glens = model.apply(variables, src, prev, train=False)
    tgt_lens = jnp.sum(tgt != CAAT_TINY.pad, axis=1).astype(jnp.int32)
    import dataclasses
    l1, _ = caat_loss(joint_h, variables["params"]["embed_tokens"], tgt,
                      glens, tgt_lens, CAAT_TINY)
    small = dataclasses.replace(CAAT_TINY, tokens_per_step=1)
    l2, _ = caat_loss(joint_h, variables["params"]["embed_tokens"], tgt,
                      glens, tgt_lens, small)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_label_smoothed_ce_matches_manual():
    V = 8
    lprobs = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(0), (2, 3, V)), axis=-1)
    targets = jnp.asarray([[2, 3, 1], [4, 1, 1]])  # 1 = pad
    loss, nll = label_smoothed_ce(lprobs, targets, 0.1, ignore_index=1)
    lp = np.asarray(lprobs)
    want_nll, want_loss = 0.0, 0.0
    eps_i = 0.1 / (V - 1)
    for b in range(2):
        for u in range(3):
            t = int(targets[b, u])
            if t == 1:
                continue
            n = -lp[b, u, t]
            s = -lp[b, u].sum()
            want_nll += n
            want_loss += (1 - 0.1 - eps_i) * n + eps_i * s
    np.testing.assert_allclose(float(nll), want_nll, rtol=1e-5)
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)
