"""wait-k simultaneous translation baseline.

Twin of rain's wait-k stack (rain/layers/waitk_decoder.py:27-325, models
waitk_transformer.py:68-137, agent rain/simul/waitk_agent.py): a standard
encoder-decoder where target step i may only cross-attend to the first
``g(i) = (i + k - 1) * stride`` source frames.  Works over either encoder
family (fbank or wav2vec).

Streaming policy (``WaitkAgent``): READ until k source blocks have arrived,
then alternate WRITE/READ one block at a time.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from wav2vec_s_tpu.models.asr import Seq2SeqDecoder, TransformerDecoderLayer
from wav2vec_s_tpu.models.caat.config import CaatConfig
from wav2vec_s_tpu.models.modules import LayerNorm
from wav2vec_s_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
from wav2vec_s_tpu.ops.block_mask import MASK_VALUE
from wav2vec_s_tpu.utils.positional import sinusoidal_table, PADDING_IDX


def waitk_cross_bias(tgt_len: int, src_len: int, k: int, stride: int,
                     dtype=jnp.float32) -> jnp.ndarray:
    """[U, S] additive mask: step i sees frames t < (i + k) * stride."""
    limit = (jnp.arange(tgt_len)[:, None] + k) * stride
    t = jnp.arange(src_len)[None, :]
    return jnp.where(t < limit, 0.0, MASK_VALUE).astype(dtype)


class WaitkDecoder(nn.Module):
    cfg: CaatConfig
    waitk: int = 3
    stride: int = 1       # source frames revealed per target step

    @nn.compact
    def __call__(self, prev_tokens, enc, enc_pad, train=False):
        c = self.cfg
        D = c.decoder_embed_dim
        B, U = prev_tokens.shape
        S = enc.shape[1]
        embed = self.param("embed_tokens",
                           nn.initializers.normal(stddev=D ** -0.5),
                           (c.vocab_size, D), jnp.float32)
        x = embed.astype(c.compute_dtype)[prev_tokens] * (D ** 0.5)
        pad_mask = prev_tokens == c.pad
        nonpad = ~pad_mask
        positions = (jnp.cumsum(nonpad.astype(jnp.int32), 1) * nonpad
                     + PADDING_IDX)
        x = x + sinusoidal_table(U + PADDING_IDX + 2, D)[positions].astype(
            x.dtype)

        causal = jnp.triu(jnp.full((U, U), MASK_VALUE, jnp.float32), k=1)
        self_bias = (causal[None, None]
                     + jnp.where(pad_mask, MASK_VALUE, 0.0)[:, None, None, :])
        cross = waitk_cross_bias(U, S, self.waitk, self.stride)[None, None]
        cross = cross + jnp.where(enc_pad, MASK_VALUE, 0.0)[:, None, None, :]

        for i in range(c.decoder_layers):
            x = TransformerDecoderLayer(
                D, c.decoder_ffn_embed_dim, c.decoder_attention_heads,
                c.dropout, c.attention_dropout,
                normalize_before=c.decoder_normalize_before,
                dtype=c.compute_dtype, name=f"layer_{i}")(
                    x, enc, self_bias, cross, deterministic=not train)
        if c.decoder_normalize_before:
            x = LayerNorm(D, name="layer_norm")(x)
        return jnp.einsum("bud,vd->buv", x.astype(jnp.float32),
                          embed.astype(jnp.float32))


class WaitkModel(nn.Module):
    """wav2vec encoder + wait-k decoder (speech wait-k baseline)."""

    w2v_cfg: Wav2Vec2Config
    cfg: CaatConfig
    waitk: int = 3
    stride: int = 8       # post-conv frames revealed per target step

    def setup(self):
        self.encoder = Wav2Vec2Model(self.w2v_cfg, encoder_type="blockwise")
        self.decoder = WaitkDecoder(self.cfg, self.waitk, self.stride)

    def __call__(self, source, prev_tokens, padding_mask=None, train=False):
        enc, enc_pad = self.encoder.extract_features(
            source, padding_mask, train=train)
        if enc_pad is None:
            enc_pad = jnp.zeros(enc.shape[:2], bool)
        return self.decoder(prev_tokens, enc, enc_pad, train=train)


class WaitkAgent:
    """Streaming wait-k policy driving a jitted decode step.

    READ until k*stride frames arrived; then one WRITE per additional
    ``stride`` frames (greedy decode; compatible with the SimulEvaluator /
    SimulEval harness agents API: push / pop_word)."""

    def __init__(self, model, params, vocab, waitk=3, stride=8,
                 frames_per_sample=1 / 320.0, max_len=100):
        self.model = model
        self.params = params
        self.vocab = vocab
        self.k = waitk
        self.stride = stride
        self.fps = frames_per_sample
        self.max_len = max_len

        @jax.jit
        def _step(params, source, prev, lens):
            logits = model.apply({"params": params}, source, prev)
            b = jnp.arange(prev.shape[0])
            return jax.nn.log_softmax(logits[b, lens - 1], axis=-1)

        self._step = _step
        self.reset()

    def reset(self):
        self.samples = []
        self.tokens = [self.vocab.eos()]
        self.queue = []
        self.finished = False
        self.done_decoding = False

    def _frames(self):
        return int(len(self.samples) * self.fps)

    def push(self, samples, is_end):
        self.samples.extend(np.asarray(samples, np.float32).tolist())
        while not self.done_decoding:
            needed = (len(self.tokens) - 1 + self.k) * self.stride
            if self._frames() < needed and not is_end:
                break
            if len(self.samples) < 400:
                break
            self._emit_one(is_end)
            if not is_end:
                break
        if is_end:
            while not self.done_decoding:
                self._emit_one(True)
            self.finished = True

    def _emit_one(self, is_end):
        src = jnp.asarray(np.asarray(self.samples, np.float32))[None]
        U = len(self.tokens)
        prev = jnp.asarray(np.asarray(self.tokens, np.int32))[None]
        lp = np.array(self._step(self.params, src, prev,
                                 jnp.asarray([U], jnp.int32)))[0]
        lp[self.vocab.pad()] = -np.inf
        tok = int(lp.argmax())
        if tok == self.vocab.eos() or U >= self.max_len:
            self.done_decoding = True
            return
        self.tokens.append(tok)
        piece = self.vocab[tok]
        self.queue.append(piece.replace("▁", ""))

    def pop_word(self):
        return self.queue.pop(0) if self.queue else None
