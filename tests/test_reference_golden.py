"""Golden parity: our flax forward vs the LIVE torch reference modules.

Round-1 parity tests covered torch *primitives* only; these run the actual
reference model classes from /root/reference on CPU (via
tests/reference_torch.py import shims), export their random-init
state_dict, import it through our checkpoint importer, and assert the flax
forward matches the torch forward on the same input:

- fairseq ``Wav2Vec2Model.extract_features`` (full-context, pos-conv path)
  — fairseq/fairseq/models/wav2vec/wav2vec2.py:544-667
- fairseq ``Wav2VecSModel`` blockwise encoder (sin positions, constant
  (mc, rc) contexts) — fairseq/fairseq/models/wav2vec/wav2vec_S.py:314-440
- warp_transducer's pure-numpy RNN-T oracle
  (warp_transducer/pytorch_binding/test/transducer_np.py) vs our jnp loss
"""

import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference_torch import load_fairseq, reference_available
from wav2vec_s_tpu.checkpoint.torch_import import (
    import_wav2vec2_params, assert_tree_shapes_match)
from wav2vec_s_tpu.models import Wav2Vec2Config, Wav2Vec2Model

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference fairseq not importable")

TINY_CONV = ((16, 10, 5), (16, 3, 2), (16, 2, 2))
TINY_CONV_STR = "[(16, 10, 5), (16, 3, 2), (16, 2, 2)]"


def _seed_all():
    torch.manual_seed(0)
    np.random.seed(0)


def _our_cfg(**kw):
    base = dict(
        conv_feature_layers=TINY_CONV, encoder_layers=2,
        encoder_embed_dim=24, encoder_ffn_embed_dim=48,
        encoder_attention_heads=4, final_dim=16, encoder_layerdrop=0.0,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        dropout_input=0.0, dropout_features=0.0,
        main_context=4, right_context=2, feature_grad_mult=1.0)
    base.update(kw)
    return Wav2Vec2Config(**base)


def test_wav2vec_s_blockwise_extract_features_golden():
    """Wav2VecSModel (blockwise, sin positions) forward parity."""
    load_fairseq()
    from fairseq.models.wav2vec.wav2vec_S import (
        Wav2VecSConfig, Wav2VecSModel)

    _seed_all()
    ref_cfg = Wav2VecSConfig(
        conv_feature_layers=TINY_CONV_STR, extractor_mode="layer_norm",
        encoder_layers=2, encoder_embed_dim=24, encoder_ffn_embed_dim=48,
        encoder_attention_heads=4, final_dim=16,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        dropout_input=0.0, dropout_features=0.0, encoder_layerdrop=0.0,
        quantize_targets=True, context_type="constant",
        conv_pos=8, conv_pos_groups=4,
        main_context=4, right_context=2, pos_type="sin")
    ref = Wav2VecSModel(ref_cfg)
    ref.eval()

    x = torch.randn(2, 2400)
    with torch.no_grad():
        want, _ = ref.extract_features(x, None)
    want = want.numpy()

    sd = {k: v for k, v in ref.state_dict().items()}
    cfg = _our_cfg(extractor_mode="layer_norm", pos_type="sin")
    params = import_wav2vec2_params(sd, cfg, encoder_type="blockwise")

    model = Wav2Vec2Model(cfg, encoder_type="blockwise")
    got, _ = model.apply({"params": params}, jnp.asarray(x.numpy()),
                         method=Wav2Vec2Model.extract_features)
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_wav2vec2_full_encoder_extract_features_golden():
    """Upstream Wav2Vec2Model (pos-conv + SamePad path) forward parity."""
    load_fairseq()
    import argparse
    from fairseq.models.wav2vec.wav2vec2 import (
        Wav2Vec2Model as RefW2V2, base_architecture)

    _seed_all()
    args = argparse.Namespace(
        conv_feature_layers=TINY_CONV_STR, extractor_mode="default",
        encoder_layers=2, encoder_embed_dim=24, encoder_ffn_embed_dim=48,
        encoder_attention_heads=4, final_dim=16,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        dropout_input=0.0, dropout_features=0.0, encoder_layerdrop=0.0,
        quantize_targets=True, conv_pos=8, conv_pos_groups=4,
        load_pretrained_model_from="")
    base_architecture(args)
    ref = RefW2V2(args)
    ref.eval()

    x = torch.randn(2, 2400)
    with torch.no_grad():
        want, _ = ref.extract_features(x, None)
    want = want.numpy()

    sd = {k: v for k, v in ref.state_dict().items()}
    cfg = _our_cfg(extractor_mode="default", pos_type="conv",
                   conv_pos=8, conv_pos_groups=4)
    params = import_wav2vec2_params(sd, cfg, encoder_type="full")

    model = Wav2Vec2Model(cfg, encoder_type="full")
    got, _ = model.apply({"params": params}, jnp.asarray(x.numpy()),
                         method=Wav2Vec2Model.extract_features)
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_blockwise_padding_mask_golden():
    """Parity with per-stream padding (uneven lengths)."""
    load_fairseq()
    from fairseq.models.wav2vec.wav2vec_S import (
        Wav2VecSConfig, Wav2VecSModel)

    _seed_all()
    ref_cfg = Wav2VecSConfig(
        conv_feature_layers=TINY_CONV_STR, extractor_mode="layer_norm",
        encoder_layers=2, encoder_embed_dim=24, encoder_ffn_embed_dim=48,
        encoder_attention_heads=4, final_dim=16,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        dropout_input=0.0, dropout_features=0.0, encoder_layerdrop=0.0,
        quantize_targets=True, context_type="constant",
        conv_pos=8, conv_pos_groups=4,
        main_context=4, right_context=2, pos_type="sin")
    ref = Wav2VecSModel(ref_cfg)
    ref.eval()

    x = torch.randn(2, 2400)
    pad = torch.zeros(2, 2400, dtype=torch.bool)
    pad[1, 1600:] = True
    x = x.masked_fill(pad, 0.0)
    with torch.no_grad():
        want, want_pad = ref.extract_features(x, pad)
    want = want.numpy()
    want_pad = want_pad.numpy()

    sd = {k: v for k, v in ref.state_dict().items()}
    cfg = _our_cfg(extractor_mode="layer_norm", pos_type="sin")
    params = import_wav2vec2_params(sd, cfg, encoder_type="blockwise")
    model = Wav2Vec2Model(cfg, encoder_type="blockwise")
    got, got_pad = model.apply(
        {"params": params}, jnp.asarray(x.numpy()),
        jnp.asarray(pad.numpy()), method=Wav2Vec2Model.extract_features)
    got, got_pad = np.asarray(got), np.asarray(got_pad)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got_pad, want_pad)
    valid = ~want_pad
    np.testing.assert_allclose(got[valid], want[valid], atol=2e-4, rtol=1e-3)


def test_import_tree_matches_fresh_init():
    """The imported reference tree must be structurally identical to ours."""
    load_fairseq()
    from fairseq.models.wav2vec.wav2vec_S import (
        Wav2VecSConfig, Wav2VecSModel)

    _seed_all()
    ref_cfg = Wav2VecSConfig(
        conv_feature_layers=TINY_CONV_STR, extractor_mode="layer_norm",
        encoder_layers=2, encoder_embed_dim=24, encoder_ffn_embed_dim=48,
        encoder_attention_heads=4, final_dim=16, quantize_targets=True,
        context_type="constant", conv_pos=8, conv_pos_groups=4,
        main_context=4, right_context=2, pos_type="sin")
    ref = Wav2VecSModel(ref_cfg)
    sd = ref.state_dict()

    cfg = _our_cfg(extractor_mode="layer_norm", pos_type="sin")
    params = import_wav2vec2_params(sd, cfg, encoder_type="blockwise")
    model = Wav2Vec2Model(cfg, encoder_type="blockwise")
    rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
        ["params", "dropout", "gumbel", "negatives", "layerdrop"])}
    init = model.init(rngs, jnp.zeros((1, 2400)), jnp.zeros((1, 2), jnp.int32),
                      0, train=False)["params"]
    assert_tree_shapes_match(params, init)


def test_rnnt_loss_vs_reference_numpy_oracle():
    """Our jnp RNN-T forward matches the reference's own numpy oracle
    (warp_transducer/pytorch_binding/test/transducer_np.py)."""
    spec = importlib.util.spec_from_file_location(
        "transducer_np",
        "/root/reference/warp_transducer/pytorch_binding/test/"
        "transducer_np.py")
    tnp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tnp)

    from wav2vec_s_tpu.ops.transducer.jnp_impl import rnnt_loss

    rng = np.random.default_rng(0)
    B, T, U1, V = 2, 5, 4, 6
    logits = rng.standard_normal((B, T, U1, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, U1 - 1)).astype(np.int32)
    t_lens = np.asarray([5, 4], np.int32)
    u_lens = np.asarray([3, 2], np.int32)

    def _log_softmax(x):
        m = x.max(axis=-1, keepdims=True)
        e = np.exp(x - m)
        return x - m - np.log(e.sum(axis=-1, keepdims=True))

    # reference oracle computes per-sample -log p over softmax'd acts
    want = []
    for b in range(B):
        tl, ul = int(t_lens[b]), int(u_lens[b])
        acts = _log_softmax(logits[b, :tl, :ul + 1])
        alphas, ll = tnp.forward_pass(acts, labels[b, :ul], blank=0)
        want.append(-ll)
    want = np.asarray(want)

    got = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                    jnp.asarray(t_lens), jnp.asarray(u_lens), blank=0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-5)
