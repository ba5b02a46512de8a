"""Stage-to-stage warm starts: load a trained encoder into a new model.

Twin of the reference's ``--pretrained-encoder-path`` flow
(rain/models/w2v2_transducer.py:234-244 ``load_pretrained_encoder`` →
w2v2_transformer.py ``upgrade_state_dict_with_pretrained_weights``): the
published simultaneous-ST recipe first fine-tunes an OFFLINE seq2seq ASR
model (arch ``online_w2v2_transformer_offline``) and then initializes the
CAAT model's streaming encoder from it
(train_wav2vec_s_caat_simulst_base.sh: ``--pretrained-encoder-path
${PRETRAIN_ASR}``).

Accepted sources:
- one of OUR checkpoint directories (orbax; the ``save_dir`` of a previous
  ``s2s``/``caat`` run, or a specific ``step_*`` dir inside it) — the
  ``params["encoder"]`` subtree is returned as-is (both ``Wav2Vec2Seq2Seq``
  and ``W2V2CaatModel`` name the blockwise wav2vec encoder ``encoder``, so
  the subtrees are structurally identical);
- a torch ``.pt`` fairseq/rain checkpoint — the wav2vec2 weights are
  name-mapped via ``import_wav2vec2_params`` (prefixes for rain's
  ``OnlineW2V2TransformerEncoder`` wrapping, fairseq's ``Wav2VecEncoder``
  fine-tune wrapping, and a bare pre-trained model).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

from wav2vec_s_tpu.checkpoint.torch_import import (
    import_wav2vec2_params, load_torch_checkpoint)

_TORCH_PREFIXES = (
    "encoder.w2v2_model.",      # rain OnlineW2V2TransformerEncoder
    "w2v_encoder.w2v_model.",   # fairseq wav2vec2_asr fine-tune heads
    "",                         # bare Wav2Vec2/Wav2VecS pre-train model
)


def load_params_tree(path) -> Dict[str, Any]:
    """Raw ``params`` pytree from one of our orbax checkpoint dirs.

    ``path`` may be a run's ``save_dir`` (latest step is used) or a
    specific ``step_*`` directory.
    """
    from wav2vec_s_tpu.checkpoint.orbax_io import CheckpointManager

    p = Path(path)
    if p.name.startswith("step_"):
        mgr = CheckpointManager(p.parent, keep_last=0)
        step = int(p.name.split("_")[1])
    else:
        mgr = CheckpointManager(p, keep_last=0)
        step = None
    state, _ = mgr.restore(step=step, template=None)
    if state is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    return state["params"] if isinstance(state, dict) and "params" in state \
        else state.params


def load_pretrained_encoder(path, w2v_cfg) -> Dict[str, Any]:
    """Encoder param subtree for a warm start (``pretrained_encoder_path``)."""
    p = Path(path)
    if p.is_file():
        sd = load_torch_checkpoint(str(p))["model"]
        for prefix in _TORCH_PREFIXES:
            if any(k.startswith(prefix + "feature_extractor.") for k in sd):
                return import_wav2vec2_params(
                    sd, w2v_cfg, encoder_type="blockwise", prefix=prefix)
        raise ValueError(
            f"{path}: no wav2vec2 encoder weights found under any known "
            f"prefix {_TORCH_PREFIXES}")
    params = load_params_tree(p)
    if "encoder" not in params:
        raise ValueError(f"{path}: checkpoint has no 'encoder' subtree")
    return params["encoder"]
