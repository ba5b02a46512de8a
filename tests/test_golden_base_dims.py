"""Golden parity at REAL wav2vec-S Base dims (the scale where convention
bugs hide: sinusoidal-table length past 1000 frames, 12-head layouts,
fp32-LN drift over 12 layers, ~10k-vocab output head).

Builds the LIVE reference stack with random weights on torch-CPU at the
published recipe dims —

- wav2vec-S Base: conv [(512,10,5)]+[(512,3,2)]*4+[(512,2,2)]*2, 12x768
  encoder / 12 heads / 3072 FFN, sin positions, layer_norm extractor
  (fairseq/fairseq/models/wav2vec/wav2vec_S.py:43-311 defaults);
- CAAT at train_wav2vec_s_caat_simulst_base.sh:38-41: decoder 6x768/12
  heads/3072, jointer 6x768/12/3072, transducer_downsample 64, vocab 10k

— then imports the state dict and asserts extract_features + the joint
lattice + the export round trip on a >20 s utterance (1049 conv frames,
exercising the position table well past the toy-dims tests).
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
from wav2vec_s_tpu.checkpoint.torch_export import export_caat_params
from wav2vec_s_tpu.models import Wav2Vec2Config, Wav2Vec2Model
from wav2vec_s_tpu.models.caat import CaatConfig, W2V2CaatModel

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(),
                       reason="reference fairseq not importable"),
]

VOCAB = 10000
SECONDS = 21.0          # 336000 samples -> 1049 conv frames (> 1000)


def _build_reference_base(tmp_path):
    load_rain()
    from fairseq.data import Dictionary
    from fairseq.models.wav2vec.wav2vec_S import (
        Wav2VecSConfig, Wav2VecSModel)
    from rain.models import w2v2_transformer
    from rain.layers.unidirect_w2v2_encoder import (
        OnlineW2V2TransformerEncoder)
    from rain.layers.attention_transducer import TransducerMHADecoder

    torch.manual_seed(0)
    # published Base pre-train config = the Wav2VecSConfig defaults with
    # sin positions + layer_norm extractor (wav2vec_S.py:43-311)
    w2v_ref_cfg = Wav2VecSConfig(
        extractor_mode="layer_norm", pos_type="sin",
        context_type="constant", main_context=16, right_context=8,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        dropout_input=0.0, dropout_features=0.0, encoder_layerdrop=0.0)
    w2v = Wav2VecSModel(w2v_ref_cfg)
    ckpt = tmp_path / "w2v_base.pt"
    torch.save({"args": argparse.Namespace(**dataclasses.asdict(w2v_ref_cfg)),
                "model": w2v.state_dict()}, str(ckpt))

    # fine-tune args at the recipe dims (train_wav2vec_s_caat_simulst_base.sh)
    args = argparse.Namespace(
        w2v2_model_path=str(ckpt), use_linear_layer=True,
        main_context=16, right_context=8,
        encoder_embed_dim=768, decoder_embed_dim=768, decoder_output_dim=768,
        decoder_ffn_embed_dim=3072, decoder_layers=6,
        decoder_attention_heads=12, decoder_normalize_before=True,
        encoder_normalize_before=True,
        share_decoder_input_output_embed=True,
        jointer_layers=6, jointer_embed_dim=768, jointer_attention_heads=12,
        jointer_ffn_embed_dim=3072, transducer_downsample=64,
        step_mode="constant", max_target_positions=1024,
        adaptive_input=False, quant_noise_pq=0, decoder_layerdrop=0.0,
        decoder_learned_pos=False, no_token_positional_embeddings=False,
        adaptive_softmax_cutoff=None, tie_adaptive_weights=False,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    w2v2_transformer.base_architecture(args)

    dictionary = Dictionary()
    for i in range(VOCAB - len(dictionary)):
        dictionary.add_symbol(f"w{i}")
    embed_tokens = torch.nn.Embedding(len(dictionary), 768,
                                      padding_idx=dictionary.pad())
    encoder = OnlineW2V2TransformerEncoder(args)
    decoder = TransducerMHADecoder(args, dictionary, embed_tokens)
    encoder.eval()
    decoder.eval()
    return w2v, encoder, decoder, dictionary


def _our_cfgs(dictionary):
    w2v_cfg = Wav2Vec2Config(
        encoder_layerdrop=0.0, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, dropout_input=0.0, dropout_features=0.0,
        feature_grad_mult=1.0)
    caat_cfg = CaatConfig(vocab_size=len(dictionary),
                          dropout=0.0, attention_dropout=0.0,
                          activation_dropout=0.0)
    return w2v_cfg, caat_cfg


def test_base_dims_extract_features_and_joint_lattice(tmp_path):
    w2v, encoder, decoder, dictionary = _build_reference_base(tmp_path)

    S = int(SECONDS * 16000)
    torch.manual_seed(1)
    x = torch.randn(2, S) * 0.5
    lengths = torch.tensor([S, S])
    rng = np.random.default_rng(0)
    U = 24
    prev_np = np.concatenate(
        [np.full((2, 1), dictionary.eos()),
         rng.integers(4, VOCAB, (2, U))], axis=1)
    prev = torch.tensor(prev_np)

    with torch.no_grad():
        feats_ref, _ = w2v.extract_features(x, None)
        enc_out = encoder(x, lengths)
        want_joint, want_glens = decoder(prev, enc_out)
    assert feats_ref.shape[1] == 1049      # > 1000 frames: table stress

    w2v_cfg, caat_cfg = _our_cfgs(dictionary)

    # 1) pre-train model extract_features parity at Base dims
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

    # 2) CAAT joint lattice parity (12-head layouts, 10k head, G groups)
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

    # 3) export round trip at scale: bit-exact per tensor
    back = export_caat_params(params)
    for k, v in sd.items():
        if k not in back:
            continue
        np.testing.assert_array_equal(
            back[k], v.numpy(), err_msg=k)
