"""Golden parity for the CAAT fine-tune stack: the LIVE rain modules
(OnlineW2V2TransformerEncoder + TransducerMHADecoder) vs our W2V2CaatModel
with weights imported through ``import_caat_params``.

This is the end-to-end checkpoint-import proof VERDICT asked for: a full
``w2v2_caat`` state dict (real reference module naming, including the
``encoder.w2v2_model.`` prefix written by rain) imports and the joint
lattice [B, G, U+1, D] matches the torch forward.
"""

import argparse
import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.reference_torch import load_rain, reference_available
from wav2vec_s_tpu.checkpoint.torch_import import import_caat_params
from wav2vec_s_tpu.models import Wav2Vec2Config
from wav2vec_s_tpu.models.caat import CaatConfig, W2V2CaatModel

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference fairseq not importable")

TINY_CONV_STR = "[(16, 10, 5), (16, 3, 2), (16, 2, 2)]"
D = 24


def _build_reference(tmp_path, w2v_dim=D, use_linear_layer=False):
    load_rain()
    from fairseq.data import Dictionary
    from fairseq.models.wav2vec.wav2vec_S import (
        Wav2VecSConfig, Wav2VecSModel)
    from rain.models import w2v2_transformer
    from rain.layers.unidirect_w2v2_encoder import (
        OnlineW2V2TransformerEncoder)
    from rain.layers.attention_transducer import TransducerMHADecoder

    torch.manual_seed(0)
    # 1) a tiny pre-trained wav2vec-S checkpoint on disk (the fine-tune
    #    encoder loads it at build, unidirect_w2v2_encoder.py:541-555)
    w2v_ref_cfg = Wav2VecSConfig(
        conv_feature_layers=TINY_CONV_STR, extractor_mode="layer_norm",
        encoder_layers=2, encoder_embed_dim=w2v_dim,
        encoder_ffn_embed_dim=48,
        encoder_attention_heads=4, final_dim=16,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        dropout_input=0.0, dropout_features=0.0, encoder_layerdrop=0.0,
        quantize_targets=True, context_type="constant",
        conv_pos=8, conv_pos_groups=4,
        main_context=4, right_context=2, pos_type="sin")
    w2v = Wav2VecSModel(w2v_ref_cfg)
    ckpt = tmp_path / "w2v_tiny.pt"
    torch.save({"args": argparse.Namespace(**dataclasses.asdict(w2v_ref_cfg)),
                "model": w2v.state_dict()}, str(ckpt))

    # 2) fine-tune args: w2v2_caat-style, tiny dims
    args = argparse.Namespace(
        w2v2_model_path=str(ckpt), use_linear_layer=use_linear_layer,
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
    return encoder, decoder, dictionary, args


def test_caat_joint_lattice_golden(tmp_path):
    encoder, decoder, dictionary, args = _build_reference(tmp_path)

    B, S, U = 2, 2400, 4
    torch.manual_seed(1)
    x = torch.randn(B, S)
    lengths = torch.tensor([S, S])
    prev = torch.tensor([[dictionary.eos(), 5, 6, 7],
                         [dictionary.eos(), 8, 9, 10]])

    with torch.no_grad():
        enc_out = encoder(x, lengths)
        want_joint, want_glens = decoder(prev, enc_out)
    want = want_joint.numpy()

    # assemble the full model state dict exactly as rain serializes it
    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in decoder.state_dict().items():
        sd[f"decoder.{k}"] = v

    w2v_cfg = Wav2Vec2Config(
        conv_feature_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
        extractor_mode="layer_norm", encoder_layers=2, encoder_embed_dim=D,
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

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_array_equal(np.asarray(got_glens),
                                  want_glens.numpy())
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_caat_use_linear_layer_golden(tmp_path):
    """--use-linear-layer with a dim-mismatched wav2vec encoder: rain
    creates ``encoder_proj`` (unidirect_w2v2_encoder.py:557-562) and every
    published fine-tune recipe passes the flag
    (train_wav2vec_s_caat_simulst_base.sh:46); joint-lattice parity with
    the projection imported and applied."""
    encoder, decoder, dictionary, args = _build_reference(
        tmp_path, w2v_dim=16, use_linear_layer=True)
    assert encoder.encoder_proj is not None

    B, S, U = 2, 2400, 4
    torch.manual_seed(1)
    x = torch.randn(B, S)
    lengths = torch.tensor([S, S])
    prev = torch.tensor([[dictionary.eos(), 5, 6, 7],
                         [dictionary.eos(), 8, 9, 10]])
    with torch.no_grad():
        enc_out = encoder(x, lengths)
        want_joint, want_glens = decoder(prev, enc_out)
    want = want_joint.numpy()

    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in decoder.state_dict().items():
        sd[f"decoder.{k}"] = v
    assert "encoder.encoder_proj.weight" in sd

    w2v_cfg = Wav2Vec2Config(
        conv_feature_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
        extractor_mode="layer_norm", encoder_layers=2, encoder_embed_dim=16,
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
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        encoder_proj=True)

    params = import_caat_params(sd, w2v_cfg, caat_cfg)
    model = W2V2CaatModel(w2v_cfg, caat_cfg)
    got_joint, got_glens = model.apply(
        {"params": params}, jnp.asarray(x.numpy()),
        jnp.asarray(prev.numpy()), train=False)
    got = np.asarray(got_joint)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_array_equal(np.asarray(got_glens),
                                  want_glens.numpy())
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_caat_export_loads_into_live_reference(tmp_path):
    """The export direction: our param tree -> rain-named state dict that
    the LIVE reference modules load, reproducing the same joint lattice —
    i.e. a model trained here can be evaluated by the reference stack."""
    from wav2vec_s_tpu.checkpoint.torch_export import export_caat_params

    encoder, decoder, dictionary, args = _build_reference(tmp_path)
    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in decoder.state_dict().items():
        sd[f"decoder.{k}"] = v

    w2v_cfg = Wav2Vec2Config(
        conv_feature_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
        extractor_mode="layer_norm", encoder_layers=2, encoder_embed_dim=D,
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

    # PERTURB the tree (as real training would) so the export is proven
    # against weights the reference has never seen
    params = {k: v for k, v in params.items()}
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x) * 1.01 + 0.003, params)
    exported = export_caat_params(params)

    # every exported tensor maps onto a reference state-dict name
    unknown = [k for k in exported if k not in sd]
    assert not unknown, f"exported keys unknown to the reference: {unknown}"

    # load into a SECOND, fresh reference stack
    torch.manual_seed(123)
    encoder2, decoder2, dictionary2, _ = _build_reference(tmp_path)
    enc_sd = {k[len("encoder."):]: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in exported.items() if k.startswith("encoder.")}
    dec_sd = {k[len("decoder."):]: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in exported.items() if k.startswith("decoder.")}
    m1, u1 = encoder2.load_state_dict(enc_sd, strict=False)
    m2, u2 = decoder2.load_state_dict(dec_sd, strict=False)
    assert not u1 and not u2, (u1, u2)     # no unexpected keys
    # missing keys may only be buffers / pre-train-only tensors
    allowed = ("_float_tensor", "mask_emb", "quantizer", "project_q",
               "final_proj", "embed_positions")
    bad = [k for k in list(m1) + list(m2)
           if not any(tok in k for tok in allowed)]
    assert not bad, f"export left real parameters unset: {bad}"

    B, S = 2, 2400
    torch.manual_seed(1)
    x = torch.randn(B, S)
    lengths = torch.tensor([S, S])
    prev = torch.tensor([[dictionary.eos(), 5, 6, 7],
                         [dictionary.eos(), 8, 9, 10]])
    with torch.no_grad():
        enc_out = encoder2(x, lengths)
        want_joint, want_glens = decoder2(prev, enc_out)

    model = W2V2CaatModel(w2v_cfg, caat_cfg)
    got_joint, got_glens = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.numpy()), jnp.asarray(prev.numpy()), train=False)
    np.testing.assert_array_equal(np.asarray(got_glens),
                                  want_glens.numpy())
    np.testing.assert_allclose(np.asarray(got_joint), want_joint.numpy(),
                               atol=3e-4, rtol=1e-3)


def test_caat_import_rejects_layer_mismatch(tmp_path):
    encoder, decoder, dictionary, args = _build_reference(tmp_path)
    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in decoder.state_dict().items():
        sd[f"decoder.{k}"] = v
    w2v_cfg = Wav2Vec2Config(
        conv_feature_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
        extractor_mode="layer_norm", encoder_layers=2, encoder_embed_dim=D,
        encoder_ffn_embed_dim=48, encoder_attention_heads=4, final_dim=16,
        main_context=4, right_context=2)
    bad = CaatConfig(vocab_size=len(dictionary), decoder_layers=5,
                     decoder_embed_dim=D, jointer_layers=2)
    with pytest.raises(ValueError, match="decoder has 2 layers"):
        import_caat_params(sd, w2v_cfg, bad)
