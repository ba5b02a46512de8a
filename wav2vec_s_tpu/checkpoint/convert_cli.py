"""Convert checkpoints between the reference torch format and ours.

Import (twin of the fork's ``fairseq_cli/convert_online_model.py``, a
train.py clone that dumps a converted online state dict, :95): a fairseq
``.pt`` (pre-trained wav2vec-S or a fine-tuned CAAT checkpoint with
``encoder.w2v2_model.*`` prefixes) becomes an orbax checkpoint directory
that the train/eval CLIs can restore from.

Export (the inverse; no reference equivalent): our orbax checkpoint becomes
a reference-named ``torch.save`` ``.pt`` the fairseq/rain stack can load —
models trained here can be evaluated with the reference's own harness.

Usage:
  # import
  python -m wav2vec_s_tpu.checkpoint.convert_cli \
      --pt /path/wav2vec-S-base.pt --out /ckpt_dir \
      [--prefix encoder.w2v2_model.] [--encoder-type blockwise] \
      [model.key=value ...]
  # export
  python -m wav2vec_s_tpu.checkpoint.convert_cli \
      --export-from /ckpt_dir --out /path/model.pt --model caat
"""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("torch <-> orbax checkpoint converter")
    p.add_argument("--pt", default=None, help="fairseq torch checkpoint "
                   "to import (default direction)")
    p.add_argument("--out", required=True,
                   help="output: orbax dir (import) or .pt path (export)")
    p.add_argument("--export-from", default=None, metavar="CKPT_DIR",
                   help="EXPORT direction: read our orbax checkpoint dir "
                        "and write a reference-named torch .pt to --out "
                        "(fairseq wav2vec2 / rain w2v2_caat naming, per "
                        "--model)")
    p.add_argument("--prefix", default="",
                   help="state-dict key prefix to strip "
                        "(e.g. 'encoder.w2v2_model.')")
    p.add_argument("--encoder-type", default="blockwise",
                   choices=["blockwise", "full"])
    p.add_argument("--model", default="w2v2",
                   choices=["w2v2", "caat"],
                   help="'caat' imports a full fine-tuned w2v2_caat "
                        "checkpoint (encoder + LM decoder + jointer + "
                        "output embed)")
    p.add_argument("--platform", default="cpu")
    p.add_argument("overrides", nargs="*", default=[],
                   help="config overrides, key=value; caat.* keys go to "
                        "CaatConfig")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from wav2vec_s_tpu.checkpoint import (
        load_torch_checkpoint, import_wav2vec2_params)
    from wav2vec_s_tpu.checkpoint.orbax_io import CheckpointManager
    from wav2vec_s_tpu.models import Wav2Vec2Config

    if args.export_from:
        from wav2vec_s_tpu.checkpoint.torch_export import (
            export_caat_params, export_wav2vec2_params,
            save_fairseq_checkpoint)

        state, _ = CheckpointManager(args.export_from, keep_last=0).restore()
        if state is None:
            raise FileNotFoundError(f"no checkpoints in {args.export_from}")
        params = state["params"] if isinstance(state, dict) else state.params
        sd = (export_caat_params(params) if args.model == "caat"
              else export_wav2vec2_params(params, prefix=args.prefix))
        save_fairseq_checkpoint(args.out, sd)
        n = sum(np.asarray(x).size for x in
                jax.tree_util.tree_leaves(params))
        print(f"exported {args.export_from} -> {args.out} "
              f"({n/1e6:.1f}M params, {len(sd)} tensors)", file=sys.stderr)
        return

    if not args.pt:
        p.error("--pt is required for the import direction "
                "(or pass --export-from for export)")
    state = load_torch_checkpoint(args.pt)
    sd = state["model"] if "model" in state else state

    kw, caat_kw = {}, {}
    for ov in args.overrides:
        k, v = ov.split("=", 1)
        import ast
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        if k.startswith("caat."):
            caat_kw[k[len("caat."):]] = v
        else:
            kw[k] = v
    # try to pick dims up from the stored config when present
    cfg_src = state.get("cfg") or {}
    model_cfg = (cfg_src.get("model") if isinstance(cfg_src, dict) else
                 None) or {}
    for key in ("encoder_layers", "encoder_embed_dim",
                "encoder_ffn_embed_dim", "encoder_attention_heads",
                "extractor_mode", "final_dim", "latent_vars",
                "latent_groups"):
        if key in model_cfg and key not in kw:
            kw[key] = model_cfg[key]
    cfg = Wav2Vec2Config(**kw)

    if args.model == "caat":
        from wav2vec_s_tpu.checkpoint.torch_import import import_caat_params
        from wav2vec_s_tpu.models.caat import CaatConfig

        for key in ("decoder_layers", "decoder_embed_dim",
                    "decoder_ffn_embed_dim", "decoder_attention_heads",
                    "jointer_layers", "jointer_embed_dim",
                    "jointer_ffn_embed_dim", "jointer_attention_heads",
                    "transducer_downsample"):
            if key in model_cfg and key not in caat_kw:
                caat_kw[key] = model_cfg[key]
        # --use-linear-layer projection is present iff rain created it
        # (dim mismatch, unidirect_w2v2_encoder.py:557-562)
        caat_kw.setdefault("encoder_proj",
                           "encoder.encoder_proj.weight" in sd)
        caat_cfg = CaatConfig(**caat_kw)
        params = import_caat_params(sd, cfg, caat_cfg)
    else:
        params = import_wav2vec2_params(
            sd, cfg, encoder_type=args.encoder_type, prefix=args.prefix)
    n = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(params))
    mgr = CheckpointManager(args.out, keep_last=0)
    mgr.save(0, {"params": params, "cfg": {}},
             extra={"source": args.pt})
    print(f"converted {args.pt} -> {args.out} ({n/1e6:.1f}M params)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
