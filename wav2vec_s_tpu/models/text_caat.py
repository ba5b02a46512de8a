"""Text-source CAAT: simultaneous TEXT translation with the attention
transducer.

Twin of ``caat_transformer`` with a text encoder
(rain/models/caat_transformer.py:104-133 — the model builds either an
audio or a TEXT encoder depending on the task; the text side feeds the
rain text agents ``text_transducer_agent.py`` / ``text_waitk.py``).

TPU-first: the unidirectional text encoder reuses the blockwise
bounded-context machinery with (mc, rc) counted in TOKEN positions; the
decoder/jointer/loss are shared with the speech CAAT models, so the same
``caat_loss``, generators and greedy streaming policy apply unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from wav2vec_s_tpu.models.caat.config import CaatConfig
from wav2vec_s_tpu.models.caat.decoder import IsolatedDecoder
from wav2vec_s_tpu.models.caat.jointer import MHAJointNet, group_lengths
from wav2vec_s_tpu.models.modules import LayerNorm
from wav2vec_s_tpu.models.wav2vec2 import EncoderLayers, Wav2Vec2Config
from wav2vec_s_tpu.ops import (
    append_right_context, block_attn_bias, block_layout,
    strip_right_context)
from wav2vec_s_tpu.utils.positional import sinusoidal_positions_from_padding


class TextBlockwiseEncoder(nn.Module):
    """Token embedding + sinusoidal positions + blockwise encoder stack
    (the unidirectional text encoder of ``caat_transformer``)."""

    cfg: Wav2Vec2Config
    vocab_size: int
    pad: int = 1

    @nn.compact
    def __call__(self, tokens, main_context=None, right_context=None,
                 train: bool = False):
        c = self.cfg
        D = c.encoder_embed_dim
        embed = self.param("embed_tokens",
                           nn.initializers.normal(stddev=D ** -0.5),
                           (self.vocab_size, D), jnp.float32)
        x = embed.astype(c.compute_dtype)[tokens] * (D ** 0.5)
        pm = tokens == self.pad
        x = x + sinusoidal_positions_from_padding(pm, D, dtype=x.dtype)
        if not c.layer_norm_first:
            x = LayerNorm(D, name="layer_norm")(x)
        mc = main_context if main_context is not None else c.main_context
        rc = right_context if right_context is not None else c.right_context
        T = x.shape[1]
        layout = block_layout(T, mc, rc)
        x = append_right_context(x, layout)
        bias = block_attn_bias(layout, pm, dtype=jnp.float32)
        x = EncoderLayers(c, name="layers")(x, bias, train)
        x = strip_right_context(x, layout)
        if c.layer_norm_first:
            x = LayerNorm(D, name="layer_norm")(x)
        return x, pm


class TextCaatModel(nn.Module):
    """Text encoder + IsolatedDecoder LM + MHA jointer (arch
    ``caat_transformer`` on text; same decode contracts as the speech
    CAAT models, so loss/generator/streaming code is shared)."""

    enc_cfg: Wav2Vec2Config
    cfg: CaatConfig
    src_vocab_size: int = 0           # 0 -> share cfg.vocab_size

    def setup(self):
        c = self.cfg
        self.encoder = TextBlockwiseEncoder(
            self.enc_cfg, self.src_vocab_size or c.vocab_size, c.pad)
        self.decoder_lm = IsolatedDecoder(c)
        self.jointer = MHAJointNet(c)
        self.embed_tokens = self.param(
            "embed_tokens",
            nn.initializers.normal(stddev=c.decoder_embed_dim ** -0.5),
            (c.vocab_size, c.decoder_embed_dim), jnp.float32)

    def encode(self, tokens, padding_mask=None, main_context=None,
               right_context=None, train=False):
        return self.encoder(tokens, main_context, right_context, train)

    def __call__(self, src_tokens, prev_tokens, padding_mask=None,
                 main_context=None, right_context=None,
                 downsample: Optional[int] = None, train=False):
        enc, enc_pad = self.encode(src_tokens, padding_mask, main_context,
                                   right_context, train)
        h_lm = self.decoder_lm(prev_tokens, train=train,
                               embed_matrix=self.embed_tokens)
        joint = self.jointer(h_lm, enc, enc_pad, downsample,
                             deterministic=not train)
        ds = (downsample if downsample is not None
              else self.cfg.transducer_downsample)
        glens = (group_lengths(enc_pad, ds) if ds > 0
                 else jnp.ones(enc.shape[0], jnp.int32))
        return joint, glens

    def decode_step(self, prev_tokens, token_lens, enc, enc_pad):
        h_lm = self.decoder_lm(prev_tokens, train=False,
                               embed_matrix=self.embed_tokens)
        k = jnp.arange(h_lm.shape[0])
        h_last = h_lm[k, token_lens - 1][:, None]
        joint = self.jointer(h_last, enc, enc_pad, downsample=-1,
                             deterministic=True)
        logits = jnp.einsum("...d,vd->...v", joint[:, 0, 0].astype(
            jnp.float32), self.embed_tokens.astype(jnp.float32))
        return jax.nn.log_softmax(logits, axis=-1)


class TextTransducerAgent:
    """Greedy simultaneous text-translation agent — twin of
    ``text_transducer_agent.py``: READ one source token per policy step,
    emit while the transducer picks non-blank.

    push(token_id, is_end) / pop_token() / finished — token-level
    interface (word gating belongs to the caller's detokenizer)."""

    def __init__(self, model, params, vocab, max_len: int = 100,
                 max_emit_per_step: int = 8, src_buckets=(8, 16, 32, 64,
                                                          128)):
        from wav2vec_s_tpu.data.batching import bucket_for

        self.model = model
        self.params = params
        self.vocab = vocab
        self.max_len = max_len
        self.max_emit = max_emit_per_step
        self.src_buckets = list(src_buckets)
        self._bucket_for = bucket_for

        @jax.jit
        def _encode(params, src):
            return model.apply({"params": params}, src,
                               method=type(model).encode)

        @jax.jit
        def _score(params, prev, lens, enc, mask):
            return model.apply({"params": params}, prev, lens, enc, mask,
                               method=type(model).decode_step)

        self._encode = _encode
        self._score = _score
        self.reset()

    def reset(self):
        self.src = []
        self.tokens = [self.vocab.bos()]
        self.out_pos = 1
        self.queue = []
        self.finished = False

    def push(self, token_id: int, is_end: bool):
        self.src.append(int(token_id))
        self._infer(is_end)
        if is_end:
            self.finished = True

    def _infer(self, is_end: bool):
        import jax.numpy as jnp

        S = self._bucket_for(len(self.src), self.src_buckets)
        src = np.full((1, S), self.vocab.pad(), np.int32)
        src[0, :len(self.src)] = self.src
        enc, enc_pad = self._encode(self.params, jnp.asarray(src))
        # reveal only received source positions (rc lookahead within the
        # revealed prefix is the blockwise mask's business)
        mask = np.ones((1, enc.shape[1]), bool)
        mask[0, :len(self.src)] = False
        blank = self.vocab.bos()
        for _ in range(self.max_emit):
            if len(self.tokens) >= self.max_len:
                break
            U = self._bucket_for(len(self.tokens), self.src_buckets)
            prev = np.full((1, U), self.vocab.pad(), np.int32)
            prev[0, :len(self.tokens)] = self.tokens
            lp = np.array(self._score(
                self.params, jnp.asarray(prev),
                jnp.asarray([len(self.tokens)], jnp.int32), enc,
                jnp.asarray(mask))[0])
            lp[self.vocab.pad()] = -np.inf
            if not is_end:
                lp[self.vocab.eos()] = -np.inf
            tok = int(lp.argmax())
            if tok == blank and not is_end:
                break                                   # READ
            if tok in (blank, self.vocab.eos()) and is_end:
                break
            self.tokens.append(tok)
            self.queue.append(tok)
            if len(self.tokens) >= self.max_len:
                break

    def pop_token(self):
        return self.queue.pop(0) if self.queue else None
