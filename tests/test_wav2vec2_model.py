"""End-to-end model tests on a tiny config (CPU, fp32)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2vec_s_tpu.models import Wav2Vec2Config, Wav2Vec2Model
from wav2vec_s_tpu.models.feature_extractor import (
    ConvFeatureExtractor, conv_output_length, conv_receptive_stride)
from wav2vec_s_tpu.train import wav2vec_loss

TINY = Wav2Vec2Config(
    conv_feature_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
    encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
    encoder_attention_heads=4, final_dim=16, latent_vars=8, latent_groups=2,
    n_negatives=4, encoder_layerdrop=0.0, main_context=4, right_context=2,
)


def _rngs():
    k = jax.random.PRNGKey(0)
    names = ["params", "dropout", "gumbel", "negatives", "layerdrop"]
    return dict(zip(names, jax.random.split(k, len(names))))


def test_conv_output_length_matches_module():
    fe = ConvFeatureExtractor(conv_layers=TINY.conv_feature_layers)
    x = jnp.zeros((1, 800))
    params = fe.init(jax.random.PRNGKey(0), x)
    y = fe.apply(params, x)
    assert y.shape[1] == conv_output_length(800, TINY.conv_feature_layers)


def test_default_stack_downsamples_320x():
    rf, hop = conv_receptive_stride()
    assert (rf, hop) == (400, 320)


@pytest.mark.parametrize("encoder_type", ["full", "blockwise"])
def test_pretrain_forward_shapes(encoder_type):
    # small conv_pos: XLA-CPU grouped-conv compile time explodes at k=128
    cfg = dataclasses.replace(TINY, conv_pos=8, conv_pos_groups=2)
    model = Wav2Vec2Model(cfg, encoder_type=encoder_type)
    B, S, M = 2, 1600, 6
    src = jax.random.normal(jax.random.PRNGKey(1), (B, S))
    T = conv_output_length(S, TINY.conv_feature_layers)
    mask_pos = jnp.stack([jnp.arange(M), jnp.arange(M) + 2]).astype(jnp.int32)
    variables = model.init(_rngs(), src, mask_pos, 0, train=False)
    out = model.apply(variables, src, mask_pos, 100, train=False,
                      rngs={k: v for k, v in _rngs().items() if k != "params"})
    assert out["logits"].shape == (B, M, 1 + TINY.n_negatives)
    logits = np.asarray(out["logits"])
    # positives finite; negatives may be -inf when a quantized distractor
    # equals the positive (reference wav2vec2.py:539-540)
    assert np.isfinite(logits[:, :, 0]).all()
    assert not np.isnan(logits).any()
    loss, sample_size, logs = wav2vec_loss(out)
    assert sample_size == B * M
    assert np.isfinite(float(loss))


def test_extract_features_blockwise():
    model = Wav2Vec2Model(TINY, encoder_type="blockwise")
    B, S = 1, 1600
    src = jax.random.normal(jax.random.PRNGKey(2), (B, S))
    mask_pos = jnp.zeros((B, 2), jnp.int32)
    variables = model.init(_rngs(), src, mask_pos, 0, train=False)
    feats, pm = model.apply(
        variables, src, method=Wav2Vec2Model.extract_features)
    T = conv_output_length(S, TINY.conv_feature_layers)
    assert feats.shape == (B, T, TINY.encoder_embed_dim)


def test_blockwise_streaming_causality():
    """Changing audio beyond a block's look-ahead must not change its output.

    Block b's output may depend on frames < (b+1)*mc + rc only.  We perturb
    the tail of the waveform and check the first block's features are
    unchanged — the load-bearing property for streaming inference.
    """
    cfg = dataclasses.replace(TINY, encoder_layerdrop=0.0)
    model = Wav2Vec2Model(cfg, encoder_type="blockwise")
    B, S = 1, 4800
    src = jax.random.normal(jax.random.PRNGKey(3), (B, S))
    mask_pos = jnp.zeros((B, 2), jnp.int32)
    variables = model.init(_rngs(), src, mask_pos, 0, train=False)

    def feats(s):
        f, _ = model.apply(variables, s, method=Wav2Vec2Model.extract_features,
                           main_context=4, right_context=2)
        return np.asarray(f)

    f1 = feats(src)
    T = f1.shape[1]
    # perturb samples after frame boundary: frames >= 16 (mc=4 -> block 0
    # covers frames 0..3, lookahead 4..5); keep a wide margin: change only the
    # samples that influence frames >= 8 (sample offset: receptive field)
    rf, hop = conv_receptive_stride(cfg.conv_feature_layers)
    cut = rf + hop * 8
    src2 = src.at[:, cut:].add(10.0)
    f2 = feats(src2)
    # block 0 (frames 0..3) depends on frames 0..5 only -> identical
    np.testing.assert_allclose(f1[0, :4], f2[0, :4], atol=1e-5)
    # later frames must differ (sanity that the perturbation mattered)
    assert np.abs(f1[0, 10:] - f2[0, 10:]).max() > 1e-3


def test_train_mode_runs_and_grads_flow():
    model = Wav2Vec2Model(TINY, encoder_type="blockwise")
    B, S, M = 2, 1600, 4
    src = jax.random.normal(jax.random.PRNGKey(4), (B, S))
    mask_pos = jnp.tile(jnp.arange(M, dtype=jnp.int32)[None], (B, 1))
    variables = model.init(_rngs(), src, mask_pos, 0, train=False)

    def loss_fn(params):
        out = model.apply(
            {"params": params}, src, mask_pos, 10, train=True,
            rngs={k: v for k, v in _rngs().items() if k != "params"})
        loss, sz, _ = wav2vec_loss(out)
        return loss / sz

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # encoder weights must receive gradient
    g_enc = grads["encoder"]["layers"]["layer_0"]["self_attn"]["q_proj"]["kernel"]
    assert np.abs(np.asarray(g_enc)).max() > 0


def test_relative_attention_module():
    from wav2vec_s_tpu.models.modules import RelativeMultiheadSelfAttention
    mod = RelativeMultiheadSelfAttention(16, 4, max_relative_position=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 16))
    p = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(p, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # relative embeddings actually contribute: zeroing them changes output
    p2 = jax.tree_util.tree_map(lambda a: a, p)
    p2 = {"params": dict(p["params"], rel_keys=jnp.zeros_like(
        p["params"]["rel_keys"]), rel_values=jnp.zeros_like(
        p["params"]["rel_values"]))}
    y2 = mod.apply(p2, x)
    assert np.abs(np.asarray(y) - np.asarray(y2)).max() > 1e-4


def test_strided_conv_matches_dense_conv():
    """_StridedConv (stride-group matmul decomposition) == nn.Conv VALID."""
    import flax.linen as nn
    from wav2vec_s_tpu.models.feature_extractor import _StridedConv

    rng = np.random.default_rng(3)
    for (k, s, C, F, T) in [(3, 2, 32, 16, 37), (2, 2, 16, 8, 40),
                            (5, 2, 8, 8, 33), (3, 3, 8, 16, 29)]:
        x = jnp.asarray(rng.standard_normal((2, T, C)), jnp.float32)
        mod = _StridedConv(features=F, kernel=k, stride=s, use_bias=True)
        p = mod.init(jax.random.PRNGKey(0), x)
        ref = nn.Conv(features=F, kernel_size=(k,), strides=(s,),
                      padding="VALID", use_bias=True)
        got = mod.apply(p, x)
        want = ref.apply(p, x)
        assert got.shape == want.shape, (k, s, got.shape, want.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
