"""W2V2-CAAT model: streaming wav2vec-S encoder + decoupled attention
transducer, and its training loss.

Re-provides ``W2V2TransducerModel`` (arch ``w2v2_caat``,
rain/models/w2v2_transducer.py:101-313) and the loss driver ``TransducerOut``
(rain/layers/attention_transducer.py:289-454).

TPU-first redesign of the loss driver: the reference manually micro-batches
the [B, G, U+1, D] joint states, runs forward+backward per chunk, accumulates
input grads and then calls ``autograd.backward(x, input_grads)`` — a hand-
rolled rematerialization to avoid materializing [B, G, U+1, V] logits.  Here
the identical math is one ``lax.scan`` over batch chunks whose body is wrapped
in ``jax.checkpoint``: XLA recomputes each chunk's vocab projection in the
backward pass, so peak memory matches the reference trick while staying a
pure, jit-compatible function.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from wav2vec_s_tpu.models.caat.config import CaatConfig
from wav2vec_s_tpu.models.caat.decoder import IsolatedDecoder
from wav2vec_s_tpu.models.caat.jointer import MHAJointNet, group_lengths
from wav2vec_s_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
from wav2vec_s_tpu.ops.transducer import (
    delay_transducer_loss, delay_cost_zero, delay_cost_diagonal,
    delay_cost_diag_positive)
from wav2vec_s_tpu.ops.transducer.analytic import delay_transducer_loss_vjp

DELAY_FUNCS = {
    "zero": delay_cost_zero,
    "diagonal": delay_cost_diagonal,
    "diag_positive": delay_cost_diag_positive,
}


class W2V2CaatModel(nn.Module):
    """Encoder-decoder shell; ``__call__`` returns joint lattice states."""

    w2v_cfg: Wav2Vec2Config
    cfg: CaatConfig

    def setup(self):
        self.encoder = Wav2Vec2Model(self.w2v_cfg, encoder_type="blockwise")
        self.decoder_lm = IsolatedDecoder(self.cfg)
        self.jointer = MHAJointNet(self.cfg)
        c = self.cfg
        self.embed_tokens = self.param(
            "embed_tokens",
            nn.initializers.normal(stddev=c.decoder_embed_dim ** -0.5),
            (c.vocab_size, c.decoder_embed_dim), jnp.float32)
        if not c.share_input_output_embed:
            self.out_proj = nn.Dense(c.vocab_size, use_bias=False,
                                     dtype=c.compute_dtype)
        if c.encoder_proj:
            # --use-linear-layer post-encoder projection
            # (rain/layers/unidirect_w2v2_encoder.py:557-562,589-600)
            self.encoder_proj = nn.Dense(c.decoder_embed_dim,
                                         dtype=c.compute_dtype)

    def encode(self, source, padding_mask=None, main_context=None,
               right_context=None, train=False):
        enc, enc_pad = self.encoder.extract_features(
            source, padding_mask, main_context, right_context, train)
        if self.cfg.encoder_proj:
            enc = self.encoder_proj(enc)
        return enc, enc_pad

    def output_logits(self, h):
        """Project joint states to vocab (shared embedding by default)."""
        if self.cfg.share_input_output_embed:
            return jnp.einsum(
                "...d,vd->...v", h.astype(jnp.float32),
                self.embed_tokens.astype(jnp.float32))
        return self.out_proj(h).astype(jnp.float32)

    def __call__(self, source, prev_tokens, padding_mask=None,
                 main_context=None, right_context=None,
                 downsample: Optional[int] = None, train=False):
        """-> (joint_h [B, G, U+1, D], group_lens [B])."""
        enc, enc_pad = self.encode(source, padding_mask, main_context,
                                   right_context, train)
        if enc_pad is None:
            enc_pad = jnp.zeros(enc.shape[:2], dtype=bool)
        h_lm = self.decoder_lm(prev_tokens, train=train,
                               embed_matrix=self.embed_tokens)
        joint_h = self.jointer(h_lm, enc, enc_pad, downsample,
                               deterministic=not train)
        ds = downsample if downsample is not None else self.cfg.transducer_downsample
        if ds > 0:
            glens = group_lengths(enc_pad, ds)
        else:
            glens = jnp.ones(enc.shape[0], jnp.int32)
        return joint_h, glens

    def lm_log_probs(self, prev_tokens):
        """Language-model view of the decoupled decoder: next-token
        log-probs [B, U, V] of the IsolatedDecoder under the (shared)
        output embedding.

        The reference has no standalone LM eval for the CAAT decoder
        (fairseq_cli/eval_lm.py scores registered LMs only); this exposes
        the same measurement — prefix perplexity of the target-side LM —
        for the decoupled decoder the paper argues stays a pure LM
        (attention_transducer.py:60-287).
        """
        h_lm = self.decoder_lm(prev_tokens, train=False,
                               embed_matrix=self.embed_tokens)
        logits = self.output_logits(h_lm)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def decode_step(self, prev_tokens, token_lens, enc, enc_pad):
        """Streaming decode scoring: log-probs of the next symbol.

        The reference threads per-layer KV caches with rollback/regather
        (TransducerMHADecoder.forward + rollback_steps,
        attention_transducer.py:886-922); here the prefix LM is recomputed at
        a static padded length — recompute-over-cache is the TPU-friendly
        trade (no mutable state, one compiled shape per bucket).

        Args:
          prev_tokens: [K, U_pad] right-padded prefixes (bos first).
          token_lens:  [K] true prefix lengths.
          enc:         [K, S, D] encoder states revealed so far.
          enc_pad:     [K, S] True where the frame is not yet visible.
        Returns log-probs [K, V].
        """
        h_lm = self.decoder_lm(prev_tokens, train=False,
                               embed_matrix=self.embed_tokens)
        k = jnp.arange(h_lm.shape[0])
        h_last = h_lm[k, token_lens - 1][:, None]          # [K, 1, D]
        joint = self.jointer(h_last, enc, enc_pad, downsample=-1,
                             deterministic=True)           # [K, 1, 1, D]
        logits = self.output_logits(joint)[:, 0, 0]
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def label_smoothed_ce(lprobs, targets, epsilon, ignore_index):
    """Summed label-smoothed NLL (fairseq label_smoothed_cross_entropy.py
    semantics). lprobs [..., V], targets [...] -> (loss, nll_loss)."""
    V = lprobs.shape[-1]
    nll = -jnp.take_along_axis(lprobs, targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.sum(lprobs, axis=-1)
    keep = (targets != ignore_index).astype(lprobs.dtype)
    eps_i = epsilon / (V - 1)
    loss = (1.0 - epsilon - eps_i) * nll + eps_i * smooth
    return jnp.sum(loss * keep), jnp.sum(nll * keep)


def caat_loss(joint_h, embed_or_proj, targets, group_lens, tgt_lens, cfg: CaatConfig):
    """Transducer + CE loss over the joint lattice, chunk-rematerialized.

    Args:
      joint_h: [B, G, U+1, D] jointer output.
      embed_or_proj: [V, D] shared projection matrix (logits = h @ W.T).
      targets: [B, U] padded labels; group_lens/tgt_lens: [B].
    Returns (loss, logs) — summed over the batch like the reference
    (reduction="sum", TransducerOut.train_step).
    """
    B, G, U1, D = joint_h.shape
    W = embed_or_proj.astype(jnp.float32)
    delay_fn = DELAY_FUNCS[cfg.delay_func]

    chunk_b = max(1, min(B, cfg.tokens_per_step // (G * U1)))
    n_chunks = math.ceil(B / chunk_b)
    pad_b = n_chunks * chunk_b - B

    def pad0(x):
        return jnp.pad(x, ((0, pad_b),) + ((0, 0),) * (x.ndim - 1))

    h = pad0(joint_h).reshape(n_chunks, chunk_b, G, U1, D)
    # pad rows must carry pad-id targets so the CE ignore-mask drops them
    tg = jnp.pad(targets, ((0, pad_b), (0, 0)),
                 constant_values=cfg.pad).reshape(n_chunks, chunk_b, -1)
    gl = jnp.maximum(pad0(group_lens), 1).reshape(n_chunks, chunk_b)
    tl = pad0(tgt_lens).reshape(n_chunks, chunk_b)
    valid = pad0(jnp.ones(B)).reshape(n_chunks, chunk_b)

    @jax.checkpoint
    def chunk_losses(hc, tgc, glc, tlc, vc):
        logits = jnp.einsum("bgud,vd->bguv", hc.astype(jnp.float32), W)
        dv = delay_fn(logits.shape[:3], glc, tlc)
        # analytic backward (betas + closed-form grad, like the reference's
        # fused CUDA kernel) instead of autodiff through the forward scans
        total, lp, ld = delay_transducer_loss_vjp(
            logits, tgc, glc, tlc, dv, cfg.delay_scale, cfg.bos,
            cfg.transducer_temperature)
        # label-smoothed CE on the last valid source group (full context)
        bi = jnp.arange(hc.shape[0])
        last_h = hc[bi, glc - 1][:, :-1]                      # [b, U, D]
        ce_logits = jnp.einsum("bud,vd->buv", last_h.astype(jnp.float32), W)
        lprobs = jax.nn.log_softmax(ce_logits, axis=-1)
        ce, nll = label_smoothed_ce(lprobs, tgc,
                                    cfg.transducer_label_smoothing, cfg.pad)
        total_sum = jnp.sum(total * vc) + cfg.transducer_ce_scale * ce
        return (total_sum, jnp.sum(lp * vc), jnp.sum(ld * vc), nll)

    def body(acc, xs):
        out = chunk_losses(*xs)
        return jax.tree_util.tree_map(jnp.add, acc, out), None

    init = (jnp.zeros(()),) * 4
    (loss, loss_prob, loss_delay, nll), _ = jax.lax.scan(
        body, init, (h, tg, gl, tl, valid))
    ntokens = jnp.sum(targets != cfg.pad)
    logs = {"loss": loss, "loss_prob": loss_prob, "loss_delay": loss_delay,
            "nll_loss": nll, "sample_size": ntokens}
    return loss, logs
