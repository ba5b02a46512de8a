"""Training CLI: ``python -m wav2vec_s_tpu.train.cli --config cfg.yaml
[section.key=value ...]``.

Re-provides the fairseq train driver (fairseq/fairseq_cli/train.py:52-488 +
trainer.py): epoch/update loop, periodic validation + checkpointing with
keep-K/best policies, patience early-stop, json progress logging, resume.

Differences by design (TPU-first):
- one jit-compiled global train step per (mc, rc) context bucket instead of
  per-batch python context sampling;
- data-parallelism is a mesh annotation, not process bootstrap — multi-host
  launch is ``jax.distributed.initialize`` + the same script on every host.
"""

from __future__ import annotations

import argparse
import dataclasses
import random
import sys
import time
from pathlib import Path

import jax
import numpy as np

from wav2vec_s_tpu.checkpoint.orbax_io import CheckpointManager
from wav2vec_s_tpu.data import (
    read_audio_manifest, read_s2t_manifest, Dictionary,
    batch_by_size, EpochBatchIterator, PretrainBatcher, CaatBatcher)
from wav2vec_s_tpu.data.batching import length_buckets
from wav2vec_s_tpu.data.tokenizer import build_tokenizer
from wav2vec_s_tpu.models import Wav2Vec2Config, Wav2Vec2Model
from wav2vec_s_tpu.models.caat import CaatConfig, W2V2CaatModel
from wav2vec_s_tpu.parallel import make_mesh, shard_batch
from wav2vec_s_tpu.parallel.mesh import process_local_rows
from wav2vec_s_tpu.train.config import TrainConfig, load_config
from wav2vec_s_tpu.train.optim import build_optimizer
from wav2vec_s_tpu.train.recipes import (
    make_pretrain_loss_fn, make_caat_loss_fn)
from wav2vec_s_tpu.train.step import TrainState, make_train_step
from wav2vec_s_tpu.utils.metrics import JsonProgress, TimeMeter


def build_pretrain(cfg: TrainConfig):
    manifest = read_audio_manifest(cfg.data.train_manifest,
                                   cfg.data.min_sample_size)
    buckets = length_buckets(cfg.data.max_sample_size,
                             min_len=cfg.data.min_sample_size, multiple=640)
    batcher = PretrainBatcher(manifest, buckets,
                              normalize=cfg.data.normalize,
                              seed=cfg.data.seed)
    model_cfg = Wav2Vec2Config(
        context_type=cfg.context.context_type,
        main_context=cfg.context.main_context,
        right_context=cfg.context.right_context,
        **cfg.model)
    model = Wav2Vec2Model(model_cfg, encoder_type="blockwise")

    def make_loss(mc, rc, downsample=None):
        return make_pretrain_loss_fn(model, mc, rc)

    def init_params(batch):
        rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
            ["params", "dropout", "gumbel", "negatives", "layerdrop"])}
        variables = model.init(
            rngs, batch["source"], batch["mask_positions"], 0, train=False)
        params = variables["params"]
        if cfg.run.load_pretrained_model_from:
            from wav2vec_s_tpu.checkpoint import (
                load_torch_checkpoint, import_wav2vec2_params)
            state = load_torch_checkpoint(cfg.run.load_pretrained_model_from)
            params = import_wav2vec2_params(state["model"], model_cfg)
        return params

    return manifest, batcher, model, make_loss, init_params


def build_caat(cfg: TrainConfig):
    if cfg.data.features == "text":
        return build_text_caat(cfg)
    manifest = read_s2t_manifest(cfg.data.train_manifest, cfg.data.audio_root)
    tgt_dict = Dictionary.load(cfg.data.vocab)
    tokenizer = build_tokenizer(cfg.data.tokenizer, cfg.data.spm_model or None,
                                cfg.data.bpe_dropout)
    fbank = cfg.data.features == "fbank"
    if fbank:
        # buckets in log-mel frames (10 ms shift), not samples
        audio_buckets = length_buckets(cfg.data.max_sample_size // 160,
                                       multiple=16)
    else:
        audio_buckets = length_buckets(cfg.data.max_sample_size, multiple=640)
    transforms = ()
    if fbank:
        from wav2vec_s_tpu.data.transforms import TFMask, Whiten
        transforms = (Whiten(),) + (
            (TFMask(seed=cfg.data.seed),) if cfg.data.specaugment else ())
    batcher = CaatBatcher(manifest, tgt_dict, tokenizer, audio_buckets,
                          task_type=cfg.data.task_type,
                          normalize=cfg.data.normalize,
                          features=cfg.data.features,
                          transforms=transforms)
    model_cfg = Wav2Vec2Config(
        main_context=cfg.context.main_context,
        right_context=cfg.context.right_context,
        context_type="constant", **cfg.model)
    caat_cfg = CaatConfig(vocab_size=len(tgt_dict), **cfg.caat)
    if fbank:
        from wav2vec_s_tpu.models.fbank import FbankCaatModel
        model = FbankCaatModel(model_cfg, caat_cfg,
                               conv_type=caat_cfg.frontend,
                               jointer_type=caat_cfg.jointer_type)
    else:
        model = W2V2CaatModel(model_cfg, caat_cfg)

    def make_loss(mc, rc, downsample=None):
        return make_caat_loss_fn(model, caat_cfg, mc, rc,
                                 downsample=downsample)

    def init_params(batch):
        tgt = batch["targets"]
        prev = np.concatenate(
            [np.full((tgt.shape[0], 1), caat_cfg.bos, tgt.dtype), tgt], 1)
        rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
            ["params", "dropout", "gumbel", "negatives", "layerdrop",
             "rand_pos"])}
        variables = model.init(rngs, batch["source"], prev, train=False)
        params = variables["params"]
        if cfg.run.w2v2_model_path and not fbank:
            from wav2vec_s_tpu.checkpoint import (
                load_torch_checkpoint, import_wav2vec2_params)
            sd = load_torch_checkpoint(cfg.run.w2v2_model_path)
            w2v = import_wav2vec2_params(sd["model"], model_cfg)
            merged = dict(params)
            enc = dict(params["encoder"])
            for k, v in w2v.items():
                enc[k] = v
            merged["encoder"] = enc
            params = merged
        params = _apply_pretrained_encoder(cfg, params, model_cfg)
        return params

    return manifest, batcher, model, make_loss, init_params


def build_text_caat(cfg: TrainConfig):
    """Simultaneous TEXT translation with the attention transducer
    (``run.task: caat`` + ``data.features: text``) — the reference's text
    side of the CAAT family (rain/models/caat_transformer.py text encoder,
    trained via rain/tasks/dropout_translation.py over fairseq bitext with
    BPE dropout).  Manifest: tsv with src_text/tgt_text columns or a
    ``src.txt,tgt.txt`` pair; block contexts count TOKEN positions."""
    from wav2vec_s_tpu.data import TextBatcher, read_text_manifest
    from wav2vec_s_tpu.models.text_caat import TextCaatModel

    manifest = read_text_manifest(cfg.data.train_manifest)
    tgt_dict = Dictionary.load(cfg.data.vocab)
    src_dict = (Dictionary.load(cfg.data.src_vocab)
                if cfg.data.src_vocab else None)
    tokenizer = build_tokenizer(cfg.data.tokenizer,
                                cfg.data.spm_model or None,
                                cfg.data.bpe_dropout)
    batcher = TextBatcher(manifest, tgt_dict, tokenizer, src_dict=src_dict)
    model_cfg = Wav2Vec2Config(
        main_context=cfg.context.main_context,
        right_context=cfg.context.right_context,
        context_type="constant", **cfg.model)
    caat_cfg = CaatConfig(vocab_size=len(tgt_dict), **cfg.caat)
    model = TextCaatModel(model_cfg, caat_cfg,
                          src_vocab_size=len(src_dict) if src_dict else 0)

    def make_loss(mc, rc, downsample=None):
        return make_caat_loss_fn(model, caat_cfg, mc, rc,
                                 downsample=downsample)

    def init_params(batch):
        tgt = batch["targets"]
        prev = np.concatenate(
            [np.full((tgt.shape[0], 1), caat_cfg.bos, tgt.dtype), tgt], 1)
        rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
            ["params", "dropout", "rand_pos"])}
        variables = model.init(rngs, batch["source"], prev, train=False)
        return variables["params"]

    return manifest, batcher, model, make_loss, init_params


def _apply_pretrained_encoder(cfg: TrainConfig, params, model_cfg):
    """``--pretrained-encoder-path`` warm start: overwrite the encoder
    subtree with a previously fine-tuned one (applied AFTER the
    w2v2_model_path import, matching the reference order — the ASR-trained
    encoder wins, rain/models/w2v2_transducer.py:247-248)."""
    if not cfg.run.pretrained_encoder_path:
        return params
    from wav2vec_s_tpu.checkpoint import load_pretrained_encoder
    enc = load_pretrained_encoder(cfg.run.pretrained_encoder_path, model_cfg)

    # template-driven merge: the source may carry extra leaves the
    # fine-tune model never creates (mask_emb, quantizer heads); every
    # template leaf must be present and shape-matched in the source
    def merge(tpl, src, path="encoder"):
        if isinstance(tpl, dict):
            missing = [k for k in tpl if k not in src]
            if missing:
                raise ValueError(
                    f"pretrained encoder at "
                    f"{cfg.run.pretrained_encoder_path} is missing "
                    f"{path}.{missing[0]}")
            return {k: merge(v, src[k], f"{path}.{k}")
                    for k, v in tpl.items()}
        t, s = np.asarray(tpl), np.asarray(src)
        if t.shape != s.shape:
            raise ValueError(f"shape mismatch at {path}: "
                             f"{t.shape} vs {s.shape}")
        return s.astype(t.dtype)

    merged = dict(params)
    merged["encoder"] = merge(params["encoder"], enc)
    print(f"encoder initialized from {cfg.run.pretrained_encoder_path}",
          file=sys.stderr)
    return merged


def build_s2s(cfg: TrainConfig):
    """Offline seq2seq fine-tuning (ASR or ST) on the blockwise encoder —
    the reference's ``online_w2v2_transformer_offline`` stage
    (train_wav2vec_s_offline_asr_base.sh) whose encoder seeds the CAAT ST
    model via ``pretrained_encoder_path``."""
    from wav2vec_s_tpu.models.asr import Wav2Vec2Seq2Seq
    from wav2vec_s_tpu.train.recipes import make_s2s_loss_fn

    manifest = read_s2t_manifest(cfg.data.train_manifest, cfg.data.audio_root)
    tgt_dict = Dictionary.load(cfg.data.vocab)
    tokenizer = build_tokenizer(cfg.data.tokenizer, cfg.data.spm_model or None,
                                cfg.data.bpe_dropout)
    audio_buckets = length_buckets(cfg.data.max_sample_size, multiple=640)
    batcher = CaatBatcher(manifest, tgt_dict, tokenizer, audio_buckets,
                          task_type=cfg.data.task_type,
                          normalize=cfg.data.normalize)
    model_cfg = Wav2Vec2Config(
        main_context=cfg.context.main_context,
        right_context=cfg.context.right_context,
        context_type="constant", **cfg.model)
    caat_cfg = CaatConfig(vocab_size=len(tgt_dict), **cfg.caat)
    model = Wav2Vec2Seq2Seq(model_cfg, caat_cfg)

    def make_loss(mc, rc, downsample=None):
        return make_s2s_loss_fn(model, caat_cfg, mc, rc,
                                label_smoothing=cfg.run.label_smoothing)

    def init_params(batch):
        tgt = batch["targets"]
        prev = np.concatenate(
            [np.full((tgt.shape[0], 1), caat_cfg.eos, tgt.dtype),
             tgt[:, :-1]], 1)
        rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
            ["params", "dropout", "gumbel", "negatives", "layerdrop"])}
        variables = model.init(rngs, batch["source"], prev, train=False)
        params = variables["params"]
        if cfg.run.w2v2_model_path:
            from wav2vec_s_tpu.checkpoint import (
                load_torch_checkpoint, import_wav2vec2_params)
            sd = load_torch_checkpoint(cfg.run.w2v2_model_path)
            w2v = import_wav2vec2_params(sd["model"], model_cfg)
            merged = dict(params)
            enc = dict(params["encoder"])
            for k, v in w2v.items():
                enc[k] = v
            merged["encoder"] = enc
            params = merged
        params = _apply_pretrained_encoder(cfg, params, model_cfg)
        return params

    return manifest, batcher, model, make_loss, init_params


def build_ctc(cfg: TrainConfig):
    """CTC fine-tuning on the (blockwise) encoder — the reference's
    fork-shipped ``Wav2VecCtc`` head (fairseq wav2vec2_asr.py:154, criterion
    criterions/ctc.py, blank = bos): the classic offline-ASR fine-tune
    behind the paper's offline WER numbers.  Reuses the S2T manifest/batcher
    with ``task_type: asr`` transcripts as targets."""
    from wav2vec_s_tpu.models.asr import Wav2VecCtc
    from wav2vec_s_tpu.train.recipes import make_ctc_loss_fn

    manifest = read_s2t_manifest(cfg.data.train_manifest, cfg.data.audio_root)
    tgt_dict = Dictionary.load(cfg.data.vocab)
    tokenizer = build_tokenizer(cfg.data.tokenizer, cfg.data.spm_model or None,
                                cfg.data.bpe_dropout)
    audio_buckets = length_buckets(cfg.data.max_sample_size, multiple=640)
    batcher = CaatBatcher(manifest, tgt_dict, tokenizer, audio_buckets,
                          task_type=cfg.data.task_type,
                          normalize=cfg.data.normalize)
    model_cfg = Wav2Vec2Config(
        main_context=cfg.context.main_context,
        right_context=cfg.context.right_context,
        context_type="constant", **cfg.model)
    model = Wav2VecCtc(model_cfg, vocab_size=len(tgt_dict),
                       final_dropout=cfg.run.final_dropout)

    def make_loss(mc, rc, downsample=None):
        return make_ctc_loss_fn(model, pad=tgt_dict.pad(), eos=tgt_dict.eos(),
                                main_context=mc, right_context=rc,
                                blank=tgt_dict.bos())

    def init_params(batch):
        rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
            ["params", "dropout", "layerdrop"])}
        variables = model.init(rngs, batch["source"], train=False)
        params = variables["params"]
        if cfg.run.w2v2_model_path:
            from wav2vec_s_tpu.checkpoint import (
                load_torch_checkpoint, import_wav2vec2_params)
            sd = load_torch_checkpoint(cfg.run.w2v2_model_path)
            w2v = import_wav2vec2_params(sd["model"], model_cfg)
            merged = dict(params)
            enc = dict(params["encoder"])
            for k, v in w2v.items():
                enc[k] = v
            merged["encoder"] = enc
            params = merged
        params = _apply_pretrained_encoder(cfg, params, model_cfg)
        return params

    return manifest, batcher, model, make_loss, init_params


def main(argv=None):
    parser = argparse.ArgumentParser(description="wav2vec_s_tpu trainer")
    parser.add_argument("--config", default=None)
    parser.add_argument("--platform", default=None,
                        help="force jax platform (e.g. cpu for testing)")
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = load_config(args.config, args.overrides)
    run = cfg.run

    if run.seq > 1:
        # context parallelism: the encoder shards its time axis over the
        # mesh's `seq` axis via a GSPMD constraint (models/wav2vec2.py)
        cfg.model.setdefault("seq_axis", "seq")

    devices = jax.devices()
    if run.num_devices:
        devices = devices[:run.num_devices]
    mesh = make_mesh(n_seq=run.seq, devices=devices)
    mesh_ctx = None
    if run.seq > 1:
        # bare-PartitionSpec sharding constraints inside the encoder need
        # an ambient mesh; jax.set_mesh works both as a global setter and
        # as a context manager — keep the context object alive for the
        # whole run either way
        mesh_ctx = jax.set_mesh(mesh)
        enter = getattr(mesh_ctx, "__enter__", None)
        if enter is not None:
            enter()
    try:
        _train(cfg, mesh, devices)
    finally:
        # in-process callers (tests, notebooks) must not leak the ambient
        # mesh into a later run built over a different device set
        exit_ = getattr(mesh_ctx, "__exit__", None)
        if mesh_ctx is not None and exit_ is not None:
            exit_(None, None, None)


def _train(cfg: TrainConfig, mesh, devices):
    run = cfg.run
    rng = random.Random(run.seed)

    if run.task == "pretrain":
        manifest, batcher, model, make_loss, init_params = build_pretrain(cfg)
        sizes = np.minimum(np.asarray(manifest.sizes),
                           cfg.data.max_sample_size)
    elif run.task == "s2s":
        manifest, batcher, model, make_loss, init_params = build_s2s(cfg)
        sizes = np.asarray(manifest.n_frames)
    elif run.task == "ctc":
        manifest, batcher, model, make_loss, init_params = build_ctc(cfg)
        sizes = np.asarray(manifest.n_frames)
    else:
        manifest, batcher, model, make_loss, init_params = build_caat(cfg)
        sizes = np.asarray(manifest.n_frames)

    n_data = len(devices) // run.seq

    batches = batch_by_size(sizes, cfg.data.max_tokens,
                            required_batch_size_multiple=n_data)
    # every batch must split evenly over the data axis
    batches = [b[:len(b) // n_data * n_data] for b in batches
               if len(b) >= n_data]
    if not batches:
        raise ValueError(
            f"no batches of size >= {n_data} (data-parallel width); "
            "reduce run.num_devices or increase data.max_tokens")
    itr = EpochBatchIterator(batches, seed=cfg.data.seed)

    optimizer = build_optimizer(cfg.optim)

    first = batcher.collate(batches[0][:2])
    params = init_params(first)
    # flat (fused) optimizer: one raveled update instead of per-leaf tree
    # maps — an option for ZeRO experiments; measured slower than the tree
    # path at base dims (see TrainState.create), so off unless requested
    flat_opt = run.flat_optimizer and not run.fsdp
    state = TrainState.create(params, optimizer, flat_optimizer=flat_opt)

    # sharded training state: ZeRO-1 optimizer-state sharding (fairseq
    # optim/shard.py OSS) and FSDP parameter sharding
    # (distributed/fully_sharded_data_parallel.py) — both are sharding
    # annotations under SPMD; XLA inserts the gathers/reduce-scatters.
    p_sh = o_sh = None
    if run.fsdp:
        from wav2vec_s_tpu.parallel.sharding import fsdp_shardings
        p_sh = fsdp_shardings(state.params, mesh)
        state = state.replace(params=jax.tree_util.tree_map(
            jax.device_put, state.params, p_sh))
    if run.zero:
        from wav2vec_s_tpu.parallel.sharding import zero_shardings
        o_sh = zero_shardings(state.opt_state, mesh)
        state = state.replace(opt_state=jax.tree_util.tree_map(
            jax.device_put, state.opt_state, o_sh))

    mgr = CheckpointManager(run.save_dir, keep_last=run.keep_last,
                            keep_best=run.keep_best,
                            async_save=run.async_checkpoints)
    if run.restore_from or mgr.latest_step() is not None:
        src = CheckpointManager(run.restore_from) if run.restore_from else mgr
        restored, meta = src.restore(template=state)
        if restored is not None:
            state = restored
            if meta and meta.get("extra", {}).get("iterator"):
                itr.load_state_dict(meta["extra"]["iterator"])
            print(f"restored checkpoint at step {int(state.step)}",
                  file=sys.stderr)

    # one compiled step per context bucket
    steps = {}

    grad_mask = None
    if run.freeze_w2v2_enc or run.freeze_finetune_updates:
        from wav2vec_s_tpu.train.recipes import make_freeze_mask
        grad_mask = make_freeze_mask(run.freeze_w2v2_enc,
                                     run.freeze_finetune_updates)

    def _pin_shardings(base):
        """Keep ZeRO/FSDP shardings stable across updates: constrain the
        output state so XLA never silently re-replicates it."""
        if p_sh is None and o_sh is None:
            return base

        def fn(state, batch, rng):
            new_state, logs = base(state, batch, rng)
            if p_sh is not None:
                new_state = new_state.replace(
                    params=jax.lax.with_sharding_constraint(
                        new_state.params, p_sh))
            if o_sh is not None:
                new_state = new_state.replace(
                    opt_state=jax.lax.with_sharding_constraint(
                        new_state.opt_state, o_sh))
            return new_state, logs

        return fn

    def get_step(mc, rc, ds=None):
        if (mc, rc, ds) not in steps:
            steps[(mc, rc, ds)] = jax.jit(
                _pin_shardings(
                    make_train_step(make_loss(mc, rc, ds), optimizer,
                                    accum_steps=run.update_freq,
                                    grad_mask=grad_mask,
                                    remat_policy=run.remat,
                                    flat_optimizer=flat_opt)),
                donate_argnums=0)
        return steps[(mc, rc, ds)]

    # sampled decision-step training (reference step_mode=random,
    # rain/layers/attention_transducer.py:800-815): one trained model serves
    # every DECISION_STEP eval point.  Host-side draw per update; one
    # compiled executable per step size (same pattern as the (mc, rc)
    # context buckets).
    sampled_steps = None
    if run.task not in ("pretrain", "s2s", "ctc") \
            and model.cfg.step_mode == "random":
        sampled_steps = model.cfg.sampled_steps

    # validation: eval-mode loss over the valid manifest (patience early stop
    # like fairseq_cli/train.py:209-236)
    valid_setup = None
    if cfg.data.valid_manifest:
        if run.task == "pretrain":
            vman = read_audio_manifest(cfg.data.valid_manifest,
                                       cfg.data.min_sample_size)
            vsizes = np.minimum(np.asarray(vman.sizes),
                                cfg.data.max_sample_size)
            vbatcher = dataclasses_replace_manifest(batcher, vman)
        elif cfg.data.features == "text":
            from wav2vec_s_tpu.data import read_text_manifest
            vman = read_text_manifest(cfg.data.valid_manifest)
            vsizes = np.asarray(vman.n_frames)
            vbatcher = dataclasses_replace_manifest(batcher, vman)
        else:
            vman = read_s2t_manifest(cfg.data.valid_manifest,
                                     cfg.data.audio_root)
            vsizes = np.asarray(vman.n_frames)
            vbatcher = dataclasses_replace_manifest(batcher, vman)
        vbatches = [b[:len(b) // n_data * n_data] for b in
                    batch_by_size(vsizes, cfg.data.max_tokens,
                                  required_batch_size_multiple=n_data)
                    if len(b) >= n_data]
        mc0, rc0 = cfg.context.main_context, cfg.context.right_context
        vloss_fn = make_loss(mc0, rc0)

        @jax.jit
        def vstep(params, batch, rng):
            loss, (n, logs) = vloss_fn(params, batch, rng, 0)
            # s2s logs n_correct: validation accuracy is the recipe's
            # --best-checkpoint-metric accuracy --maximize (offline ASR)
            return loss, n, logs.get("n_correct", loss * 0.0)

        # generation-based validation BLEU (rain w2v2_s2s_task.py:199-236);
        # CTC runs report argmax-decode WER instead (fairseq
        # criterions/ctc.py eval_wer path)
        vdecode = vtexts = None
        if (run.eval_bleu or (run.eval_wer and run.task == "ctc")) \
                and run.task != "pretrain" and jax.process_count() == 1:
            # BLEU decode reads hypotheses back row-by-row, which needs a
            # fully-addressable array; multi-host runs validate loss-only
            from wav2vec_s_tpu.eval.generator import (
                make_ctc_greedy_decoder, make_offline_greedy_decoder,
                make_s2s_greedy_decoder)
            tgt_dict = vbatcher.tgt_dict
            make_dec = {"s2s": make_s2s_greedy_decoder,
                        "ctc": make_ctc_greedy_decoder}.get(
                            run.task, make_offline_greedy_decoder)
            vdecode = make_dec(model, tgt_dict, mc0, rc0)
            vtexts = (vman.src_texts if cfg.data.task_type == "asr"
                      else vman.tgt_texts)

        valid_setup = (vbatcher, vbatches, vstep, vdecode, vtexts, vsizes)

    def validate(params):
        from wav2vec_s_tpu.stream.searcher import detok_pieces

        vbatcher, vbatches, vstep, vdecode, vtexts, vsz = valid_setup
        tot, n, ncorr = 0.0, 0.0, 0.0
        hyps, refs = [], []
        for bidx in vbatches:
            # multi-host: same row-sharded collation as training; on
            # multi-process runs loss and BLEU cover this host's shard
            if run.task == "pretrain":
                hint = int(vsz[bidx].min())
            else:
                hint = int(vsz[bidx].max())
                if cfg.data.features == "fbank":
                    hint //= 160
            local = bidx[process_local_rows(len(bidx))]
            hb = vbatcher.collate(local, size_hint=hint)
            vb = shard_batch(mesh, hb)
            l, sz, nc = vstep(params, vb, jax.random.PRNGKey(0))
            tot += float(l)
            n += float(sz)
            ncorr += float(nc)
            if vdecode is not None:
                pfx, lens = vdecode(params, vb["source"],
                                    vb.get("padding_mask"))
                pfx, lens = np.asarray(pfx), np.asarray(lens)
                tok = getattr(vbatcher, "tokenizer", None)
                for r in range(len(local)):
                    hyps.append(detok_pieces(vbatcher.tgt_dict, tok,
                                             pfx[r, 1:lens[r]]))
                    refs.append(vtexts[local[r]])
        vloss = tot / max(n, 1.0)
        vacc = ncorr / max(n, 1.0) if run.task == "s2s" else None
        if vdecode is None:
            return vloss, None, vacc
        if run.task == "ctc":
            from wav2vec_s_tpu.eval.wer import corpus_wer
            return vloss, corpus_wer(hyps, refs), vacc
        from wav2vec_s_tpu.eval.bleu import corpus_bleu
        return vloss, corpus_bleu(hyps, refs), vacc

    # failure detection behind run.debug_nan (fairseq nan_detector.py via
    # trainer.py:801-811 + DistributedTimeoutWrapper): localize the first
    # non-finite leaf instead of silently skipping the update, and raise if
    # the device wedges for >10min without completing an update.
    watchdog = None
    if run.debug_nan:
        from wav2vec_s_tpu.utils.debug import NanDetector, Watchdog
        watchdog = Watchdog(timeout=600.0)
        watchdog.start()

    def check_finite(logs, state):
        if not run.debug_nan:
            return
        if watchdog is not None:
            watchdog.ping()
        if not np.isfinite(float(logs["loss_total"])):
            bad = (NanDetector.check(logs, "logs")
                   + NanDetector.check(state.params, "params"))
            raise FloatingPointError(
                "non-finite loss; offending leaves: " + "; ".join(bad))

    progress = JsonProgress(tensorboard_dir=run.tensorboard_dir or None)
    speed = TimeMeter()
    base_rng = jax.random.PRNGKey(run.seed)
    window = {}
    best_valid, bad_validations = float("inf"), 0
    stop = False

    def _collate_train(batch_idx):
        # multi-host: every process draws the same batch order and
        # collates only its contiguous row block of the global batch;
        # the size hint pins the pad/crop bucket to the GLOBAL batch
        # so per-host shards collate to consistent shapes
        if run.task == "pretrain":
            hint = int(sizes[batch_idx].min())
        else:
            hint = int(sizes[batch_idx].max())
            if cfg.data.features == "fbank":
                hint //= 160
        host_batch = batcher.collate(
            batch_idx[process_local_rows(len(batch_idx))], size_hint=hint)
        if run.update_freq > 1:
            host_batch = {k: _microbatch(v, run.update_freq)
                          for k, v in host_batch.items()}
        return host_batch

    from wav2vec_s_tpu.data.prefetch import prefetch_batches

    # host-side step mirror: state.step is a device scalar, and reading it
    # (or any log value) every iteration forces a device sync per update —
    # profiled at ~18% of step wall-clock.  The hot loop below keeps logs
    # as device arrays and defers every readback to log/valid/save points.
    host_step = int(state.step)
    while host_step < run.max_update and not stop:
        for batch_idx, host_batch in prefetch_batches(
                itr.next_epoch_itr(), _collate_train, run.prefetch):
            if host_step >= run.max_update:
                break
            if run.task == "pretrain" and cfg.context.context_type == "sampling":
                from wav2vec_s_tpu.train.recipes import sample_context_bucket
                mc, rc = sample_context_bucket(rng, cfg.context.buckets)
            else:
                mc, rc = cfg.context.main_context, cfg.context.right_context
            ds = (sampled_steps[rng.randrange(len(sampled_steps))]
                  if sampled_steps else None)

            batch = shard_batch(mesh, host_batch)
            state, logs = get_step(mc, rc, ds)(
                state, batch, jax.random.fold_in(base_rng, host_step))
            host_step += 1

            check_finite(logs, state)
            # --profile twin: trace steps [10, 20) once warm
            if run.profile_dir:
                if host_step == 10:
                    jax.profiler.start_trace(run.profile_dir)
                elif host_step == 20:
                    jax.profiler.stop_trace()
                    print(f"profile trace written to {run.profile_dir}",
                          file=sys.stderr)
            speed.update(1)
            for k, v in logs.items():
                window.setdefault(k, []).append(v)   # device arrays: no sync
            if ds is not None:
                window.setdefault("decision_step", []).append(float(ds))

            step_no = host_step
            if step_no % run.log_interval == 0:
                stats = {k: float(np.mean([float(x) for x in v]))
                         for k, v in window.items()}
                if "loss_total" in stats and "sample_size" in stats:
                    stats["loss_per_sample"] = (
                        stats["loss_total"] / max(stats["sample_size"], 1))
                stats["ups"] = round(speed.avg, 2)
                progress.log(stats, step_no)
                window.clear()

            if valid_setup is not None and run.validate_interval_updates \
                    and step_no % run.validate_interval_updates == 0:
                vloss, vscore, vacc = validate(state.params)
                vstats = {"valid_loss": vloss}
                if vscore is not None:
                    vstats["valid_wer" if run.task == "ctc"
                           else "valid_bleu"] = vscore
                if vacc is not None:
                    vstats["valid_accuracy"] = vacc
                progress.log(vstats, step_no, tag="valid")
                # patience/best track BLEU (negated: lower is better) when
                # eval_bleu is on — or WER directly for CTC; s2s tracks
                # accuracy (the reference's --best-checkpoint-metric
                # accuracy --maximize); else loss
                if vscore is not None:
                    vmetric = vscore if run.task == "ctc" else -vscore
                elif vacc is not None:
                    vmetric = -vacc
                else:
                    vmetric = vloss
                if vmetric < best_valid - 1e-6:
                    best_valid, bad_validations = vmetric, 0
                else:
                    bad_validations += 1
                    if run.patience and bad_validations >= run.patience:
                        print(f"early stop: no improvement in "
                              f"{run.patience} validations", file=sys.stderr)
                        stop = True

            if run.save_interval_updates and \
                    step_no % run.save_interval_updates == 0:
                mgr.save(step_no, state,
                         extra={"iterator": itr.state_dict()},
                         metric=(best_valid if valid_setup is not None else
                                 float(logs["loss_total"])
                                 / max(float(logs["sample_size"]), 1)))
            if stop:
                break

    if watchdog is not None:
        watchdog.stop()
    if run.profile_dir and 10 <= host_step < 20:
        try:
            jax.profiler.stop_trace()     # run ended inside the window
        except RuntimeError:
            pass
    mgr.save(host_step, state, extra={"iterator": itr.state_dict()})
    mgr.wait()                         # commit any in-flight async write
    print(f"training done at step {host_step}", file=sys.stderr)


def _microbatch(x: np.ndarray, k: int) -> np.ndarray:
    b = x.shape[0] // k * k
    return x[:b].reshape((k, b // k) + x.shape[1:])


def dataclasses_replace_manifest(batcher, manifest):
    import dataclasses as _dc

    new = _dc.replace(batcher, manifest=manifest)
    # validation batcher: strip augmentation transforms (TFMask)
    if getattr(new, "transforms", ()):
        from wav2vec_s_tpu.data.transforms import TFMask
        new = _dc.replace(new, transforms=tuple(
            t for t in new.transforms if not isinstance(t, TFMask)))
    # ... and BPE dropout (text family trains with sampled segmentations,
    # validates deterministic — rain dropout_translation eval path)
    for attr in ("tokenizer", "src_tokenizer"):
        tok = getattr(new, attr, None)
        if tok is not None and getattr(tok, "bpe_dropout", 0.0) > 0:
            import copy

            clean = copy.copy(tok)
            clean.bpe_dropout = 0.0
            new = _dc.replace(new, **{attr: clean})
    return new


if __name__ == "__main__":
    main()
