"""Loss-fn adapters binding models to the generic train step.

The two training recipes of the reference (SURVEY §3.1/§3.2):
- streaming pre-training: InfoNCE + diversity + features_pen over sampled
  block contexts;
- CAAT fine-tuning: delay-transducer + label-smoothed CE driven through the
  joint lattice.

Static context (mc, rc) / decision step (downsample) are bound at factory
time: the sampled-context schedule draws a bucket host-side per update and
dispatches to the matching compiled executable (one compile per bucket,
replacing the reference's per-batch python ``random.randint``
(wav2vec_S.py:392-395) which is free on GPU eager but would be a
recompilation storm under XLA).
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from wav2vec_s_tpu.train.criterion import wav2vec_loss
from wav2vec_s_tpu.models.caat.transducer_model import caat_loss

PRETRAIN_RNG_NAMES = ("dropout", "gumbel", "negatives", "layerdrop")
CAAT_RNG_NAMES = ("dropout", "layerdrop", "rand_pos")
S2S_RNG_NAMES = ("dropout", "layerdrop")


def _rng_dict(rng, names):
    keys = jax.random.split(rng, len(names))
    return dict(zip(names, keys))


def make_pretrain_loss_fn(model, main_context: Optional[int] = None,
                          right_context: Optional[int] = None):
    """loss_fn for ``make_train_step`` — batch: {source, mask_positions,
    [padding_mask]}."""

    def loss_fn(params, batch, rng, step):
        out = model.apply(
            {"params": params}, batch["source"], batch["mask_positions"],
            step, padding_mask=batch.get("padding_mask"),
            main_context=main_context, right_context=right_context,
            train=True, rngs=_rng_dict(rng, PRETRAIN_RNG_NAMES))
        loss, n, logs = wav2vec_loss(out)
        scalars = {k: jnp.asarray(v, jnp.float32) for k, v in logs.items()
                   if v is not None and k != "sample_size"}
        return loss, (n, scalars)

    return loss_fn


def make_caat_loss_fn(model, caat_cfg, main_context=None, right_context=None,
                      downsample: Optional[int] = None):
    """loss_fn for CAAT fine-tuning — batch: {source, targets,
    [padding_mask]}; prev tokens are built in-graph ([bos; targets])."""

    def loss_fn(params, batch, rng, step):
        tgt = batch["targets"]
        B = tgt.shape[0]
        prev = jnp.concatenate(
            [jnp.full((B, 1), caat_cfg.bos, dtype=tgt.dtype), tgt], axis=1)
        joint_h, glens = model.apply(
            {"params": params}, batch["source"], prev,
            padding_mask=batch.get("padding_mask"),
            main_context=main_context, right_context=right_context,
            downsample=downsample, train=True,
            rngs=_rng_dict(rng, CAAT_RNG_NAMES))
        tgt_lens = jnp.sum(tgt != caat_cfg.pad, axis=1).astype(jnp.int32)
        loss, logs = caat_loss(joint_h, params["embed_tokens"], tgt, glens,
                               tgt_lens, caat_cfg)
        n = logs.pop("sample_size")
        scalars = {k: jnp.asarray(v, jnp.float32) for k, v in logs.items()}
        return loss, (n, scalars)

    return loss_fn


def make_s2s_loss_fn(model, caat_cfg, main_context=None, right_context=None,
                     label_smoothing: float = 0.1):
    """Label-smoothed CE + accuracy for the seq2seq fine-tune head.

    The reference's offline ASR/ST fine-tuning stage — the model the CAAT
    ST recipe warm-starts its encoder from (``--pretrained-encoder-path``,
    train_wav2vec_s_caat_simulst_base.sh): arch
    ``online_w2v2_transformer_offline`` trained with ``--criterion
    label_smoothed_cross_entropy --label-smoothing 0.1 --report-accuracy``
    (train_wav2vec_s_offline_asr_base.sh; rain task w2v2_s2s).  Loss
    follows fairseq's ``label_smoothed_nll_loss``; ``n_correct/total``
    accuracy is the recipe's ``--best-checkpoint-metric accuracy``.
    """
    pad, eos = caat_cfg.pad, caat_cfg.eos

    def loss_fn(params, batch, rng, step):
        tgt = batch["targets"]               # [B, U] ends with eos, padded
        B = tgt.shape[0]
        # fairseq prev_output_tokens: target shifted right, eos-prefixed
        prev = jnp.concatenate(
            [jnp.full((B, 1), eos, tgt.dtype), tgt[:, :-1]], axis=1)
        logits = model.apply(
            {"params": params}, batch["source"], prev,
            padding_mask=batch.get("padding_mask"),
            main_context=main_context, right_context=right_context,
            train=True, rngs=_rng_dict(rng, S2S_RNG_NAMES))
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        mask = (tgt != pad)
        m = mask.astype(jnp.float32)
        V = lprobs.shape[-1]
        nll = -jnp.take_along_axis(
            lprobs, tgt[..., None].astype(jnp.int32), axis=-1)[..., 0]
        smooth = -jnp.sum(lprobs, axis=-1)
        eps_i = label_smoothing / (V - 1)
        per_tok = (1.0 - label_smoothing - eps_i) * nll + eps_i * smooth
        loss = jnp.sum(per_tok * m)
        ntokens = jnp.sum(m)
        n_correct = jnp.sum((jnp.argmax(lprobs, -1) == tgt) & mask)
        scalars = {
            "nll_loss": jnp.sum(nll * m),
            "n_correct": n_correct.astype(jnp.float32),
            "accuracy": n_correct / jnp.maximum(ntokens, 1.0),
        }
        return loss, (ntokens, scalars)

    return loss_fn


def make_ctc_loss_fn(model, pad: int, eos: int, main_context=None,
                     right_context=None, blank: int = 0):
    """CTC fine-tuning loss for ``Wav2VecCtc`` (fairseq criterions/ctc.py:
    summed CTC over the encoder frames, blank = bos, sample_size =
    ntokens).  The reference's classic offline-ASR fine-tune of a wav2vec
    model (wav2vec2_asr.py:154 Wav2VecCtc) — the stage behind the paper's
    offline WER table.  Targets arrive eos-terminated from ``CaatBatcher``;
    the trailing eos is folded into the label padding (fairseq CTC targets
    carry no eos)."""
    from wav2vec_s_tpu.models.asr import ctc_loss

    def loss_fn(params, batch, rng, step):
        tgt = batch["targets"]
        logits, lpad = model.apply(
            {"params": params}, batch["source"],
            padding_mask=batch.get("padding_mask"),
            main_context=main_context, right_context=right_context,
            train=True, rngs=_rng_dict(rng, S2S_RNG_NAMES))
        tpad = (tgt == pad) | (tgt == eos)
        loss = ctc_loss(logits, lpad, tgt.astype(jnp.int32), tpad,
                        blank=blank)
        ntokens = jnp.sum(~tpad).astype(jnp.float32)
        n_frames = jnp.sum(~lpad).astype(jnp.float32)
        return loss, (ntokens, {"nll_loss": loss, "n_frames": n_frames})

    return loss_fn


def sample_context_bucket(rng: random.Random,
                          buckets: Sequence[Tuple[int, int]]):
    """Host-side (mc, rc) draw with the EXACT reference distribution
    (wav2vec_S.py:392-395: ``mc = randint(4,16)*2``,
    ``rc = min(randint(2,8)*2, mc // 2)``), snapped to the nearest
    compiled bucket.  Bucket *frequencies* thus follow the reference's
    joint distribution pushed through the snap map, instead of being
    uniform over buckets — one executable per bucket still bounds the
    compile count."""
    mc = rng.randint(4, 16) * 2
    rc = min(rng.randint(2, 8) * 2, mc // 2)
    return min(buckets, key=lambda b: abs(b[0] - mc) + abs(b[1] - rc))


# default bucket set covering the sampled range with few compilations
DEFAULT_CONTEXT_BUCKETS = (
    (8, 4), (12, 6), (16, 8), (20, 8), (24, 12), (28, 12), (32, 16),
)


def make_freeze_mask(freeze_w2v2_enc: int = 0,
                     freeze_finetune_updates: int = 0,
                     encoder_key: str = "encoder"):
    """Gradient mask implementing the reference's freeze schedules.

    - ``freeze_w2v2_enc`` (rain/models/w2v2_transducer.py:163-174): freeze
      every w2v2 parameter permanently except encoder layers >= N;
    - ``freeze_finetune_updates`` (unidirect_w2v2_encoder.py:585-588): the
      whole w2v2 encoder gets no gradient until step N.

    Returns a ``grad_mask(grads, step)`` for ``make_train_step`` (the
    traced-step equivalent of requires_grad surgery / no_grad contexts).
    """
    import re

    layer_re = re.compile(r"\['layers'\]\['layer_(\d+)'\]")

    def grad_mask(grads, step):
        def one(path, g):
            keys = [getattr(p, "key", None) for p in path]
            if encoder_key not in keys:
                return g
            scale = jnp.asarray(1.0, g.dtype)
            if freeze_finetune_updates > 0:
                scale = scale * (step >= freeze_finetune_updates)
            if freeze_w2v2_enc > 0:
                m = layer_re.search(jax.tree_util.keystr(path))
                trainable = bool(m) and int(m.group(1)) >= freeze_w2v2_enc
                if not trainable:
                    scale = scale * 0.0
            return g * scale

        return jax.tree_util.tree_map_with_path(one, grads)

    return grad_mask
