"""Pre-LN (Large-arch) golden parity vs the LIVE torch reference.

Every other golden runs the post-LN Base path; the Large recipes — half
the published results — use ``layer_norm_first: true``
(examples/wav2vec/config/pretraining/wav2vec-S_large_librivox.yaml,
encoder branch fairseq/fairseq/models/wav2vec/wav2vec2.py:874-978), which
moves every LayerNorm off the residual path.  Round-4 verdict "Missing
#2": no pre-LN configuration had a reference cross-check.

- fast: tiny-dims pre-LN blockwise extract_features + pre-LN CAAT joint
  lattice;
- slow: the full ST-Large recipe dims (conv [(512,...)]x7 with conv_bias,
  24x1024/16-head pre-LN encoder; decoder/jointer 12x1024/16/4096,
  train_wav2vec_s_caat_simulst_large.sh:38-41).
"""

import argparse
import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.reference_torch import load_rain, reference_available
from wav2vec_s_tpu.checkpoint.torch_import import (
    import_caat_params, import_wav2vec2_params)
from wav2vec_s_tpu.models import (
    Wav2Vec2Config, Wav2Vec2Model, wav2vec_s_large_config)
from wav2vec_s_tpu.models.caat import CaatConfig, W2V2CaatModel

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference fairseq not importable")

TINY_CONV = ((16, 10, 5), (16, 3, 2), (16, 2, 2))
TINY_CONV_STR = "[(16, 10, 5), (16, 3, 2), (16, 2, 2)]"
D = 24


def _ref_w2v_preln(tiny=True):
    from fairseq.models.wav2vec.wav2vec_S import (
        Wav2VecSConfig, Wav2VecSModel)

    torch.manual_seed(0)
    if tiny:
        cfg = Wav2VecSConfig(
            conv_feature_layers=TINY_CONV_STR, extractor_mode="layer_norm",
            layer_norm_first=True, encoder_layers=2, encoder_embed_dim=D,
            encoder_ffn_embed_dim=48, encoder_attention_heads=4,
            final_dim=16, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, dropout_input=0.0, dropout_features=0.0,
            encoder_layerdrop=0.0, quantize_targets=True,
            context_type="constant", conv_pos=8, conv_pos_groups=4,
            main_context=4, right_context=2, pos_type="sin")
    else:
        # wav2vec-S Large pre-train model config (the yaml above)
        cfg = Wav2VecSConfig(
            extractor_mode="layer_norm", layer_norm_first=True,
            conv_bias=True, final_dim=768,
            encoder_layers=24, encoder_embed_dim=1024,
            encoder_ffn_embed_dim=4096, encoder_attention_heads=16,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            dropout_input=0.0, dropout_features=0.0, encoder_layerdrop=0.0,
            quantize_targets=True, context_type="constant",
            main_context=16, right_context=8, pos_type="sin")
    m = Wav2VecSModel(cfg)
    m.eval()
    return m, cfg


def test_preln_blockwise_extract_features_golden():
    """Tiny-dims pre-LN encoder forward parity (the Large residual
    path: LN off-residual everywhere + the extra final encoder LN)."""
    load_rain()
    ref, _ = _ref_w2v_preln(tiny=True)

    x = torch.randn(2, 2400)
    with torch.no_grad():
        want, _ = ref.extract_features(x, None)
    want = want.numpy()

    cfg = Wav2Vec2Config(
        conv_feature_layers=TINY_CONV, extractor_mode="layer_norm",
        layer_norm_first=True, encoder_layers=2, encoder_embed_dim=D,
        encoder_ffn_embed_dim=48, encoder_attention_heads=4, final_dim=16,
        encoder_layerdrop=0.0, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, dropout_input=0.0, dropout_features=0.0,
        main_context=4, right_context=2, pos_type="sin",
        feature_grad_mult=1.0)
    params = import_wav2vec2_params(
        {k: v for k, v in ref.state_dict().items()}, cfg,
        encoder_type="blockwise")
    model = Wav2Vec2Model(cfg, encoder_type="blockwise")
    got, _ = model.apply({"params": params}, jnp.asarray(x.numpy()),
                         method=Wav2Vec2Model.extract_features)
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_preln_caat_joint_lattice_golden(tmp_path):
    """Tiny-dims CAAT with a PRE-LN wav2vec encoder: the fine-tune path
    the Large eval scripts run."""
    load_rain()
    from fairseq.data import Dictionary
    from rain.models import w2v2_transformer
    from rain.layers.unidirect_w2v2_encoder import (
        OnlineW2V2TransformerEncoder)
    from rain.layers.attention_transducer import TransducerMHADecoder

    w2v, w2v_ref_cfg = _ref_w2v_preln(tiny=True)
    ckpt = tmp_path / "w2v_preln.pt"
    torch.save({"args": argparse.Namespace(**dataclasses.asdict(w2v_ref_cfg)),
                "model": w2v.state_dict()}, str(ckpt))

    args = argparse.Namespace(
        w2v2_model_path=str(ckpt), use_linear_layer=False,
        main_context=4, right_context=2,
        encoder_embed_dim=D, decoder_embed_dim=D, decoder_output_dim=D,
        decoder_ffn_embed_dim=48, decoder_layers=2,
        decoder_attention_heads=4, decoder_normalize_before=True,
        encoder_normalize_before=True,
        share_decoder_input_output_embed=True,
        jointer_layers=2, jointer_embed_dim=D, jointer_attention_heads=4,
        jointer_ffn_embed_dim=48, transducer_downsample=8,
        step_mode="constant", max_target_positions=1024,
        adaptive_input=False, quant_noise_pq=0, decoder_layerdrop=0.0,
        decoder_learned_pos=False, no_token_positional_embeddings=False,
        adaptive_softmax_cutoff=None, tie_adaptive_weights=False,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    w2v2_transformer.base_architecture(args)
    dictionary = Dictionary()
    for i in range(30 - len(dictionary)):
        dictionary.add_symbol(f"w{i}")
    embed_tokens = torch.nn.Embedding(len(dictionary), D,
                                      padding_idx=dictionary.pad())
    encoder = OnlineW2V2TransformerEncoder(args)
    decoder = TransducerMHADecoder(args, dictionary, embed_tokens)
    encoder.eval()
    decoder.eval()

    B, S = 2, 2400
    torch.manual_seed(1)
    x = torch.randn(B, S)
    prev = torch.tensor([[dictionary.eos(), 5, 6, 7],
                         [dictionary.eos(), 8, 9, 10]])
    with torch.no_grad():
        enc_out = encoder(x, torch.tensor([S, S]))
        want_joint, want_glens = decoder(prev, enc_out)

    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in decoder.state_dict().items():
        sd[f"decoder.{k}"] = v

    w2v_cfg = Wav2Vec2Config(
        conv_feature_layers=TINY_CONV, extractor_mode="layer_norm",
        layer_norm_first=True, encoder_layers=2, encoder_embed_dim=D,
        encoder_ffn_embed_dim=48, encoder_attention_heads=4, final_dim=16,
        encoder_layerdrop=0.0, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, dropout_input=0.0, dropout_features=0.0,
        main_context=4, right_context=2, pos_type="sin",
        feature_grad_mult=1.0)
    caat_cfg = CaatConfig(
        vocab_size=len(dictionary), decoder_layers=2, decoder_embed_dim=D,
        decoder_ffn_embed_dim=48, decoder_attention_heads=4,
        jointer_layers=2, jointer_embed_dim=D, jointer_ffn_embed_dim=48,
        jointer_attention_heads=4, transducer_downsample=8,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    params = import_caat_params(sd, w2v_cfg, caat_cfg)
    model = W2V2CaatModel(w2v_cfg, caat_cfg)
    got_joint, got_glens = model.apply(
        {"params": params}, jnp.asarray(x.numpy()),
        jnp.asarray(prev.numpy()), train=False)
    got = np.asarray(got_joint)
    assert got.shape == want_joint.shape
    np.testing.assert_array_equal(np.asarray(got_glens),
                                  want_glens.numpy())
    np.testing.assert_allclose(got, want_joint.numpy(), atol=3e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_large_dims_preln_golden(tmp_path):
    """ST-Large recipe dims: 24x1024/16-head pre-LN encoder with the real
    conv stack (conv_bias=true), decoder/jointer 12x1024/16/4096
    (train_wav2vec_s_caat_simulst_large.sh:38-41); extract_features + the
    joint lattice, same tolerances as the Base-dims golden."""
    load_rain()
    from fairseq.data import Dictionary
    from rain.models import w2v2_transformer
    from rain.layers.unidirect_w2v2_encoder import (
        OnlineW2V2TransformerEncoder)
    from rain.layers.attention_transducer import TransducerMHADecoder

    w2v, w2v_ref_cfg = _ref_w2v_preln(tiny=False)
    ckpt = tmp_path / "w2v_large.pt"
    torch.save({"args": argparse.Namespace(**dataclasses.asdict(w2v_ref_cfg)),
                "model": w2v.state_dict()}, str(ckpt))

    VOCAB = 10000
    args = argparse.Namespace(
        w2v2_model_path=str(ckpt), use_linear_layer=True,
        main_context=16, right_context=8,
        encoder_embed_dim=1024, decoder_embed_dim=1024,
        decoder_output_dim=1024, decoder_ffn_embed_dim=4096,
        decoder_layers=12, decoder_attention_heads=16,
        decoder_normalize_before=True, encoder_normalize_before=True,
        share_decoder_input_output_embed=True,
        jointer_layers=12, jointer_embed_dim=1024,
        jointer_attention_heads=16, jointer_ffn_embed_dim=4096,
        transducer_downsample=64, step_mode="constant",
        max_target_positions=1024, adaptive_input=False, quant_noise_pq=0,
        decoder_layerdrop=0.0, decoder_learned_pos=False,
        no_token_positional_embeddings=False, adaptive_softmax_cutoff=None,
        tie_adaptive_weights=False, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0)
    w2v2_transformer.base_architecture(args)
    dictionary = Dictionary()
    for i in range(VOCAB - len(dictionary)):
        dictionary.add_symbol(f"w{i}")
    embed_tokens = torch.nn.Embedding(len(dictionary), 1024,
                                      padding_idx=dictionary.pad())
    encoder = OnlineW2V2TransformerEncoder(args)
    decoder = TransducerMHADecoder(args, dictionary, embed_tokens)
    encoder.eval()
    decoder.eval()

    S = int(6.0 * 16000)                      # ~299 conv frames
    torch.manual_seed(1)
    x = torch.randn(2, S) * 0.5
    rng = np.random.default_rng(0)
    U = 12
    prev_np = np.concatenate(
        [np.full((2, 1), dictionary.eos()),
         rng.integers(4, VOCAB, (2, U))], axis=1)
    prev = torch.tensor(prev_np)

    with torch.no_grad():
        feats_ref, _ = w2v.extract_features(x, None)
        enc_out = encoder(x, torch.tensor([S, S]))
        want_joint, want_glens = decoder(prev, enc_out)

    w2v_cfg = wav2vec_s_large_config(
        conv_bias=True, encoder_layerdrop=0.0, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0, dropout_input=0.0,
        dropout_features=0.0, feature_grad_mult=1.0)
    caat_cfg = CaatConfig(
        vocab_size=VOCAB, decoder_layers=12, decoder_embed_dim=1024,
        decoder_ffn_embed_dim=4096, decoder_attention_heads=16,
        jointer_layers=12, jointer_embed_dim=1024,
        jointer_ffn_embed_dim=4096, jointer_attention_heads=16,
        transducer_downsample=64, dropout=0.0, attention_dropout=0.0,
        # no encoder_proj: rain only creates the projection on an
        # encoder/decoder dim mismatch, and Large is 1024 == 1024
        activation_dropout=0.0)

    # 1) pre-train extract_features parity at Large dims
    params_w2v = import_wav2vec2_params(
        {k: v for k, v in w2v.state_dict().items()}, w2v_cfg,
        encoder_type="blockwise")
    model_w2v = Wav2Vec2Model(w2v_cfg, encoder_type="blockwise")
    got_feats, _ = model_w2v.apply(
        {"params": params_w2v}, jnp.asarray(x.numpy()),
        method=Wav2Vec2Model.extract_features)
    got_feats = np.asarray(got_feats)
    want_feats = feats_ref.numpy()
    assert got_feats.shape == want_feats.shape
    np.testing.assert_allclose(got_feats, want_feats, atol=2e-3, rtol=1e-3)

    # 2) CAAT joint lattice parity at ST-Large dims
    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in decoder.state_dict().items():
        sd[f"decoder.{k}"] = v
    params = import_caat_params(sd, w2v_cfg, caat_cfg)
    model = W2V2CaatModel(w2v_cfg, caat_cfg)
    got_joint, got_glens = model.apply(
        {"params": params}, jnp.asarray(x.numpy()),
        jnp.asarray(prev_np.astype(np.int32)), train=False)
    got_joint = np.asarray(got_joint)
    want = want_joint.numpy()
    assert got_joint.shape == want.shape, (got_joint.shape, want.shape)
    np.testing.assert_array_equal(np.asarray(got_glens),
                                  want_glens.numpy())
    np.testing.assert_allclose(got_joint, want, atol=5e-3, rtol=1e-3)
