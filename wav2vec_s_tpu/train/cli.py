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

    def make_loss(mc, rc):
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
    model = W2V2CaatModel(model_cfg, caat_cfg)

    def make_loss(mc, rc):
        return make_caat_loss_fn(model, caat_cfg, mc, rc)

    def init_params(batch):
        import jax.numpy as jnp
        tgt = batch["targets"]
        prev = np.concatenate(
            [np.full((tgt.shape[0], 1), caat_cfg.bos, tgt.dtype), tgt], 1)
        rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
            ["params", "dropout", "gumbel", "negatives", "layerdrop",
             "rand_pos"])}
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
    rng = random.Random(run.seed)

    if run.task == "pretrain":
        manifest, batcher, model, make_loss, init_params = build_pretrain(cfg)
        sizes = np.minimum(np.asarray(manifest.sizes),
                           cfg.data.max_sample_size)
    else:
        manifest, batcher, model, make_loss, init_params = build_caat(cfg)
        sizes = np.asarray(manifest.n_frames)

    devices = jax.devices()
    if run.num_devices:
        devices = devices[:run.num_devices]
    mesh = make_mesh(devices=devices)
    n_data = len(devices)

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
    state = TrainState.create(params, optimizer)

    mgr = CheckpointManager(run.save_dir, keep_last=run.keep_last,
                            keep_best=run.keep_best)
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

    def get_step(mc, rc):
        if (mc, rc) not in steps:
            steps[(mc, rc)] = jax.jit(
                make_train_step(make_loss(mc, rc), optimizer,
                                accum_steps=run.update_freq,
                                grad_mask=grad_mask),
                donate_argnums=0)
        return steps[(mc, rc)]

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
            return loss, n

        valid_setup = (vbatcher, vbatches, vstep)

    def validate(params):
        vbatcher, vbatches, vstep = valid_setup
        tot, n = 0.0, 0.0
        for bidx in vbatches:
            vb = shard_batch(mesh, vbatcher.collate(bidx))
            l, sz = vstep(params, vb, jax.random.PRNGKey(0))
            tot += float(l)
            n += float(sz)
        return tot / max(n, 1.0)

    progress = JsonProgress(tensorboard_dir=run.tensorboard_dir or None)
    speed = TimeMeter()
    base_rng = jax.random.PRNGKey(run.seed)
    window = {}
    best_valid, bad_validations = float("inf"), 0
    stop = False

    while int(state.step) < run.max_update and not stop:
        for batch_idx in itr.next_epoch_itr():
            if int(state.step) >= run.max_update:
                break
            if run.task == "pretrain" and cfg.context.context_type == "sampling":
                mc, rc = cfg.context.buckets[
                    rng.randrange(len(cfg.context.buckets))]
            else:
                mc, rc = cfg.context.main_context, cfg.context.right_context

            host_batch = batcher.collate(batch_idx)
            if run.update_freq > 1:
                host_batch = {k: _microbatch(v, run.update_freq)
                              for k, v in host_batch.items()}
            batch = shard_batch(mesh, host_batch)
            state, logs = get_step(mc, rc)(
                state, batch, jax.random.fold_in(base_rng, int(state.step)))

            n = float(logs["sample_size"])
            speed.update(1)
            for k, v in logs.items():
                window.setdefault(k, []).append(float(v))

            step_no = int(state.step)
            if step_no % run.log_interval == 0:
                stats = {k: float(np.mean(v)) for k, v in window.items()}
                if "loss_total" in stats and "sample_size" in stats:
                    stats["loss_per_sample"] = (
                        stats["loss_total"] / max(stats["sample_size"], 1))
                stats["ups"] = round(speed.avg, 2)
                progress.log(stats, step_no)
                window.clear()

            if valid_setup is not None and run.validate_interval_updates \
                    and step_no % run.validate_interval_updates == 0:
                vloss = validate(state.params)
                progress.log({"valid_loss": vloss}, step_no, tag="valid")
                if vloss < best_valid - 1e-6:
                    best_valid, bad_validations = vloss, 0
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
                                 float(logs["loss_total"]) / max(n, 1)))
            if stop:
                break

    mgr.save(int(state.step), state, extra={"iterator": itr.state_dict()})
    print(f"training done at step {int(state.step)}", file=sys.stderr)


def _microbatch(x: np.ndarray, k: int) -> np.ndarray:
    b = x.shape[0] // k * k
    return x[:b].reshape((k, b // k) + x.shape[1:])


def dataclasses_replace_manifest(batcher, manifest):
    import dataclasses as _dc

    return _dc.replace(batcher, manifest=manifest)


if __name__ == "__main__":
    main()
