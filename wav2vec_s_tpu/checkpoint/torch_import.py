"""Import reference fairseq torch checkpoints into our flax param trees.

The published wav2vec-S checkpoints are fairseq ``torch.save`` dicts
(``{args/cfg, model, optimizer_history, extra_state, ...}``, assembled by
fairseq/fairseq/trainer.py:345-379 and checkpoint_utils.py).  This module
name-maps the ``model`` state dict onto our param tree and fixes up layout
differences:

- torch ``Linear.weight [out, in]``  -> flax ``kernel [in, out]`` (transpose)
- torch ``Conv1d.weight [out, in/g, k]`` -> flax ``kernel [k, in/g, out]``
- torch ``weight_norm`` (pos-conv) is folded: ``w = g * v / ||v||`` with the
  norm over all dims except dim=2, matching ``nn.utils.weight_norm(...,
  dim=2)`` at wav2vec2.py:802
- norm ``weight/bias`` -> ``scale/bias``

Checkpoint-parity quirks handled elsewhere but relied on here: conv-extractor
``layer_norm_num`` (wav2vec2.py:317), sinusoidal position offset
(padding_idx=1), SamePad trim for even pos-conv kernels.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a fairseq checkpoint; returns the raw dict with numpy tensors."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    return state


def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd, prefix):
    out = {"kernel": _t(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _norm(sd, prefix):
    return {"scale": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}


def _conv1d(sd, prefix):
    w = _t(sd[prefix + ".weight"])  # [out, in/g, k]
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _weight_normed_conv1d(sd, prefix):
    g = _t(sd[prefix + ".weight_g"])  # [1, 1, k]
    v = _t(sd[prefix + ".weight_v"])  # [out, in/g, k]
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _import_conv_extractor(sd, mode: str, layer_norm_num: int, n_layers: int):
    p = {}
    for i in range(n_layers):
        base = f"feature_extractor.conv_layers.{i}"
        p[f"conv_{i}"] = _conv1d(sd, base + ".0")
        if mode == "layer_norm" and i < layer_norm_num:
            # Sequential(conv, dropout, Sequential(Transpose, LN, Transpose), GELU)
            p[f"ln_{i}"] = _norm(sd, base + ".2.1")
        elif mode == "default" and i == 0:
            p[f"gn_{i}"] = _norm(sd, base + ".2")
    return p


def _import_encoder_layer(sd, base):
    p = {}
    p["self_attn"] = {
        proj: _linear(sd, f"{base}.self_attn.{proj}")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj")
    }
    p["self_attn_layer_norm"] = _norm(sd, base + ".self_attn_layer_norm")
    p["fc1"] = _linear(sd, base + ".fc1")
    p["fc2"] = _linear(sd, base + ".fc2")
    p["final_layer_norm"] = _norm(sd, base + ".final_layer_norm")
    return p


def import_wav2vec2_params(state_dict: Dict[str, Any], cfg,
                           encoder_type: str = "blockwise",
                           prefix: str = "") -> Dict[str, Any]:
    """Map a fairseq Wav2Vec2/Wav2VecS ``model`` state dict to our params.

    ``prefix`` strips a leading path (e.g. ``"w2v_encoder.w2v_model."`` for
    fine-tuned encoders, ``"encoder.w2v_model."`` for rain's
    OnlineW2V2TransformerEncoder checkpoints).
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}

    n_conv = len(cfg.conv_feature_layers)
    p: Dict[str, Any] = {}
    p["feature_extractor"] = _import_conv_extractor(
        sd, cfg.extractor_mode, cfg.layer_norm_num, n_conv)
    p["layer_norm"] = _norm(sd, "layer_norm")
    if "post_extract_proj.weight" in sd:
        p["post_extract_proj"] = _linear(sd, "post_extract_proj")
    if "mask_emb" in sd:
        p["mask_emb"] = _t(sd["mask_emb"])

    enc = {}
    if encoder_type == "full":
        enc["pos_conv"] = {"conv": _weight_normed_conv1d(sd, "encoder.pos_conv.0")}
    enc["layer_norm"] = _norm(sd, "encoder.layer_norm")
    layers = {}
    i = 0
    while f"encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        layers[f"layer_{i}"] = _import_encoder_layer(sd, f"encoder.layers.{i}")
        i += 1
    enc["layers"] = layers
    p["encoder"] = enc

    if "quantizer.vars" in sd:
        p["quantizer"] = {
            "vars": _t(sd["quantizer.vars"]),
            "weight_proj": _linear(sd, "quantizer.weight_proj"),
        }
    if "project_q.weight" in sd:
        p["project_q"] = _linear(sd, "project_q")
    if "final_proj.weight" in sd:
        p["final_proj"] = _linear(sd, "final_proj")
    return p


def import_caat_params(state_dict: Dict[str, Any], w2v_cfg, caat_cfg
                       ) -> Dict[str, Any]:
    """Map a fine-tuned rain ``w2v2_caat`` state dict onto a W2V2CaatModel
    param tree.

    Reference naming (rain/models/w2v2_transducer.py +
    rain/layers/attention_transducer.py:60-922):

    - ``encoder.w2v2_model.*``          -> ``encoder`` (blockwise wav2vec2;
      unidirect_w2v2_encoder.py:554)
    - ``decoder.lm.embed_tokens.weight``-> ``embed_tokens`` (shared with the
      output projection when share_decoder_input_output_embed,
      attention_transducer.py:861-863)
    - ``decoder.lm.layers.{i}.*``       -> ``decoder_lm.layer_{i}`` (the
      IsolatedDecoder's self-attention-only TransformerDecoder layers)
    - ``decoder.lm.layer_norm.*``       -> ``decoder_lm.layer_norm`` (pre-LN)
    - ``decoder.jointer.layers.{i}.*``  -> ``jointer.layer_{i}``
      (enc_attn q/k/v/out projections, attn/final layer norms, fc1/fc2)
    - ``decoder.transducer_out.output_proj.weight`` -> ``out_proj`` (only
      when the embedding is NOT shared; attribute name per
      attention_transducer.py:311)

    Buffers (sinusoidal position ``_float_tensor`` etc.) are ignored — our
    position tables are recomputed functions of (length, dim).
    """
    sd = state_dict
    p: Dict[str, Any] = {}
    p["encoder"] = import_wav2vec2_params(
        sd, w2v_cfg, encoder_type="blockwise", prefix="encoder.w2v2_model.")
    if "encoder.encoder_proj.weight" in sd:
        # --use-linear-layer post-encoder projection; rain only creates it
        # when the dims mismatch (unidirect_w2v2_encoder.py:557-562)
        if not caat_cfg.encoder_proj:
            raise ValueError(
                "checkpoint has encoder.encoder_proj (--use-linear-layer) "
                "but CaatConfig.encoder_proj is False")
        p["encoder_proj"] = _linear(sd, "encoder.encoder_proj")
    elif caat_cfg.encoder_proj:
        raise ValueError(
            "CaatConfig.encoder_proj=True but the checkpoint has no "
            "encoder.encoder_proj weights")

    p["embed_tokens"] = _t(sd["decoder.lm.embed_tokens.weight"])

    lm: Dict[str, Any] = {}
    i = 0
    while f"decoder.lm.layers.{i}.self_attn.q_proj.weight" in sd:
        lm[f"layer_{i}"] = _import_encoder_layer(sd, f"decoder.lm.layers.{i}")
        i += 1
    if i != caat_cfg.decoder_layers:
        raise ValueError(f"decoder has {i} layers, config says "
                         f"{caat_cfg.decoder_layers}")
    if "decoder.lm.layer_norm.weight" in sd:
        lm["layer_norm"] = _norm(sd, "decoder.lm.layer_norm")
    p["decoder_lm"] = lm

    jointer: Dict[str, Any] = {}
    i = 0
    while f"decoder.jointer.layers.{i}.enc_attn.q_proj.weight" in sd:
        base = f"decoder.jointer.layers.{i}"
        jointer[f"layer_{i}"] = {
            "enc_attn": {
                proj: _linear(sd, f"{base}.enc_attn.{proj}")
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "attn_layer_norm": _norm(sd, base + ".attn_layer_norm"),
            "final_layer_norm": _norm(sd, base + ".final_layer_norm"),
            "fc1": _linear(sd, base + ".fc1"),
            "fc2": _linear(sd, base + ".fc2"),
        }
        i += 1
    if i != caat_cfg.jointer_layers:
        raise ValueError(f"jointer has {i} layers, config says "
                         f"{caat_cfg.jointer_layers}")
    p["jointer"] = jointer

    if not caat_cfg.share_input_output_embed:
        p["out_proj"] = {
            "kernel": _t(sd["decoder.transducer_out.output_proj.weight"]).T}
    return p


def assert_tree_shapes_match(imported, init_params, path=""):
    """Recursively check the imported tree against a freshly-initialized one."""
    if isinstance(init_params, dict):
        missing = set(init_params) - set(imported)
        extra = set(imported) - set(init_params)
        if missing or extra:
            raise ValueError(f"at {path}: missing={missing} extra={extra}")
        for k in init_params:
            assert_tree_shapes_match(imported[k], init_params[k], f"{path}/{k}")
    else:
        got, want = np.shape(imported), np.shape(init_params)
        if got != want:
            raise ValueError(f"at {path}: shape {got} != expected {want}")
