"""Export our flax param trees as reference-named fairseq/rain state dicts.

The inverse of ``torch_import``: a model trained in this framework can be
handed back to the reference stack (fairseq ``Wav2Vec2Model``/``wav2vec_S``
or rain's ``w2v2_caat``) for its own eval harness — completing the
checkpoint round-trip (import: published ``.pt`` -> ours; export: ours ->
``torch.save``-compatible dict with the naming of
fairseq/fairseq/models/wav2vec/wav2vec2.py and
rain/models/w2v2_transducer.py + rain/layers/attention_transducer.py).

Layout fix-ups mirror the import direction exactly:

- flax ``kernel [in, out]``        -> torch ``Linear.weight [out, in]``
- flax conv ``kernel [k, in/g, out]`` -> torch ``Conv1d.weight [out, in/g, k]``
- the folded pos-conv weight is re-expressed as ``weight_norm`` params with
  ``v = w, g = ||w||`` (norm over all dims except dim=2) — folding
  ``g * v / ||v||`` on reimport reproduces ``w`` bit-for-bit
- norm ``scale/bias`` -> ``weight/bias``
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _a(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _linear(out: Dict[str, np.ndarray], prefix: str, p: Dict[str, Any]):
    out[prefix + ".weight"] = _a(p["kernel"]).T
    if "bias" in p:
        out[prefix + ".bias"] = _a(p["bias"])


def _norm(out, prefix, p):
    out[prefix + ".weight"] = _a(p["scale"])
    out[prefix + ".bias"] = _a(p["bias"])


def _conv1d(out, prefix, p):
    out[prefix + ".weight"] = np.transpose(_a(p["kernel"]), (2, 1, 0))
    if "bias" in p:
        out[prefix + ".bias"] = _a(p["bias"])


def _weight_normed_conv1d(out, prefix, p):
    w = np.transpose(_a(p["kernel"]), (2, 1, 0))  # [out, in/g, k]
    g = np.sqrt((w ** 2).sum(axis=(0, 1), keepdims=True))
    out[prefix + ".weight_g"] = g
    out[prefix + ".weight_v"] = w
    if "bias" in p:
        out[prefix + ".bias"] = _a(p["bias"])


def _export_conv_extractor(out, p):
    i = 0
    while f"conv_{i}" in p:
        base = f"feature_extractor.conv_layers.{i}"
        _conv1d(out, base + ".0", p[f"conv_{i}"])
        if f"ln_{i}" in p:
            # Sequential(conv, dropout, Sequential(Transpose, LN, Transpose),
            # GELU) in layer_norm mode (wav2vec2.py:742-760)
            _norm(out, base + ".2.1", p[f"ln_{i}"])
        elif f"gn_{i}" in p:
            _norm(out, base + ".2", p[f"gn_{i}"])
        i += 1


def _export_encoder_layer(out, base, p):
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        _linear(out, f"{base}.self_attn.{proj}", p["self_attn"][proj])
    _norm(out, base + ".self_attn_layer_norm", p["self_attn_layer_norm"])
    _linear(out, base + ".fc1", p["fc1"])
    _linear(out, base + ".fc2", p["fc2"])
    _norm(out, base + ".final_layer_norm", p["final_layer_norm"])


def export_wav2vec2_params(params: Dict[str, Any], prefix: str = ""
                           ) -> Dict[str, np.ndarray]:
    """Our Wav2Vec2Model param tree -> fairseq ``model`` state dict
    (numpy values; pass through ``save_fairseq_checkpoint`` to write a
    ``.pt``).  ``prefix`` prepends a path (e.g. ``"encoder.w2v2_model."``
    for the rain fine-tuned-encoder naming)."""
    out: Dict[str, np.ndarray] = {}
    _export_conv_extractor(out, params["feature_extractor"])
    _norm(out, "layer_norm", params["layer_norm"])
    if "post_extract_proj" in params:
        _linear(out, "post_extract_proj", params["post_extract_proj"])
    if "mask_emb" in params:
        out["mask_emb"] = _a(params["mask_emb"])

    enc = params["encoder"]
    if "pos_conv" in enc:
        _weight_normed_conv1d(out, "encoder.pos_conv.0", enc["pos_conv"]["conv"])
    _norm(out, "encoder.layer_norm", enc["layer_norm"])
    for name, layer in enc["layers"].items():
        i = int(name.split("_")[1])
        _export_encoder_layer(out, f"encoder.layers.{i}", layer)

    if "quantizer" in params:
        out["quantizer.vars"] = _a(params["quantizer"]["vars"])
        _linear(out, "quantizer.weight_proj",
                params["quantizer"]["weight_proj"])
    if "project_q" in params:
        _linear(out, "project_q", params["project_q"])
    if "final_proj" in params:
        _linear(out, "final_proj", params["final_proj"])
    if prefix:
        out = {prefix + k: v for k, v in out.items()}
    return out


def export_caat_params(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our W2V2CaatModel param tree -> rain ``w2v2_caat`` state dict
    (naming per import_caat_params' docstring; the exact inverse)."""
    out = export_wav2vec2_params(params["encoder"],
                                 prefix="encoder.w2v2_model.")
    if "encoder_proj" in params:
        # --use-linear-layer (unidirect_w2v2_encoder.py:557-562)
        _linear(out, "encoder.encoder_proj", params["encoder_proj"])
    out["decoder.lm.embed_tokens.weight"] = _a(params["embed_tokens"])

    lm = params["decoder_lm"]
    for name, layer in lm.items():
        if not name.startswith("layer_") or name == "layer_norm":
            continue
        i = int(name.split("_")[1])
        _export_encoder_layer(out, f"decoder.lm.layers.{i}", layer)
    if "layer_norm" in lm:
        _norm(out, "decoder.lm.layer_norm", lm["layer_norm"])

    for name, layer in params["jointer"].items():
        i = int(name.split("_")[1])
        base = f"decoder.jointer.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear(out, f"{base}.enc_attn.{proj}", layer["enc_attn"][proj])
        _norm(out, base + ".attn_layer_norm", layer["attn_layer_norm"])
        _norm(out, base + ".final_layer_norm", layer["final_layer_norm"])
        _linear(out, base + ".fc1", layer["fc1"])
        _linear(out, base + ".fc2", layer["fc2"])

    # the reference's TransducerOut always owns an output_proj Linear —
    # tied to embed_tokens.weight when share_input_output_embed
    # (attention_transducer.py:859-868) — and fairseq's TransformerDecoder
    # registers a `version` buffer; emit both so the exported dict loads
    # with no missing decoder keys.
    if "out_proj" in params:
        out["decoder.transducer_out.output_proj.weight"] = _a(
            params["out_proj"]["kernel"]).T
    else:
        out["decoder.transducer_out.output_proj.weight"] = _a(
            params["embed_tokens"])
    out["decoder.lm.version"] = np.asarray([3.0], np.float32)
    return out


def save_fairseq_checkpoint(path: str, model_sd: Dict[str, np.ndarray],
                            cfg: Dict[str, Any] | None = None) -> None:
    """Write a fairseq-loadable ``torch.save`` checkpoint (the dict shape
    trainer.state_dict assembles, fairseq/fairseq/trainer.py:345-379 —
    minus optimizer history, which eval-side loads ignore)."""
    import torch

    state = {
        "args": None,
        "cfg": cfg or {},
        "model": {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in model_sd.items()},
        "optimizer_history": [],
        "extra_state": {},
        "last_optimizer_state": None,
    }
    torch.save(state, path)
