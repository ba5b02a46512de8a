"""CTC and seq2seq fine-tuning heads on the (blockwise) wav2vec encoder.

Twins of the reference's fork-shipped fine-tune models
(fairseq/fairseq/models/wav2vec/wav2vec2_asr.py): ``Wav2VecCtc`` (:154,
encoder + final dropout + vocab projection, CTC with blank = bos) and
``Wav2Vec2Seq2SeqModel`` (:247, encoder + cross-attention transformer
decoder).  Both accept the full-context or blockwise encoder, so streaming
CTC ASR falls out for free.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from wav2vec_s_tpu.models.caat.config import CaatConfig
from wav2vec_s_tpu.models.modules import (
    LayerNorm, MultiheadSelfAttention, TransformerEncoderLayer)
from wav2vec_s_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
from wav2vec_s_tpu.ops.block_mask import MASK_VALUE
from wav2vec_s_tpu.utils.positional import sinusoidal_table, PADDING_IDX


class Wav2VecCtc(nn.Module):
    w2v_cfg: Wav2Vec2Config
    vocab_size: int
    encoder_type: str = "blockwise"
    final_dropout: float = 0.0

    def setup(self):
        self.encoder = Wav2Vec2Model(self.w2v_cfg,
                                     encoder_type=self.encoder_type)
        self.proj = nn.Dense(self.vocab_size,
                             dtype=self.w2v_cfg.compute_dtype)

    def __call__(self, source, padding_mask=None, main_context=None,
                 right_context=None, train=False):
        x, pad = self.encoder.extract_features(
            source, padding_mask, main_context, right_context, train)
        if self.final_dropout > 0 and train:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.final_dropout, x.shape)
            x = x * keep / (1.0 - self.final_dropout)
        logits = self.proj(x).astype(jnp.float32)
        if pad is None:
            pad = jnp.zeros(logits.shape[:2], bool)
        return logits, pad


def ctc_loss(logits, logit_pad, targets, target_pad, blank: int = 0):
    """Summed CTC loss (fairseq criterions/ctc.py semantics, blank = bos)."""
    per_seq = optax.ctc_loss(logits, logit_pad.astype(jnp.float32),
                             targets, target_pad.astype(jnp.float32),
                             blank_id=blank)
    return jnp.sum(per_seq)


def ctc_greedy_decode(logits, logit_pad, blank: int = 0):
    """Best-path decode: argmax, collapse repeats, drop blanks -> list[list]."""
    import numpy as np

    ids = np.asarray(jnp.argmax(logits, axis=-1))
    pad = np.asarray(logit_pad)
    out = []
    for b in range(ids.shape[0]):
        prev, seq = -1, []
        for t in range(ids.shape[1]):
            if pad[b, t]:
                break
            i = int(ids[b, t])
            if i != blank and i != prev:
                seq.append(i)
            prev = i
        out.append(seq)
    return out


class TransformerDecoderLayer(nn.Module):
    """Pre/post-LN decoder layer with encoder cross-attention
    (fairseq TransformerDecoderLayer)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc, self_bias, cross_bias, deterministic=True):
        def drop(t):
            if self.dropout == 0 or deterministic:
                return t
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1.0 - self.dropout, t.shape)
            return t * keep / (1.0 - self.dropout)

        ln_s = LayerNorm(self.embed_dim, name="self_attn_layer_norm")
        ln_c = LayerNorm(self.embed_dim, name="encoder_attn_layer_norm")
        ln_f = LayerNorm(self.embed_dim, name="final_layer_norm")

        residual = x
        h = ln_s(x) if self.normalize_before else x
        h = MultiheadSelfAttention(self.embed_dim, self.num_heads,
                                   self.attention_dropout, dtype=self.dtype,
                                   name="self_attn")(h, self_bias,
                                                     deterministic)
        x = residual + drop(h)
        if not self.normalize_before:
            x = ln_s(x)

        residual = x
        h = ln_c(x) if self.normalize_before else x
        h = MultiheadSelfAttention(self.embed_dim, self.num_heads,
                                   self.attention_dropout, dtype=self.dtype,
                                   name="encoder_attn")(h, cross_bias,
                                                        deterministic,
                                                        kv=enc)
        x = residual + drop(h)
        if not self.normalize_before:
            x = ln_c(x)

        residual = x
        h = ln_f(x) if self.normalize_before else x
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = drop(jax.nn.relu(h))
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")(h)
        x = residual + drop(h)
        if not self.normalize_before:
            x = ln_f(x)
        return x


class Seq2SeqDecoder(nn.Module):
    cfg: CaatConfig          # reuse the decoder hyperparameter block

    @nn.compact
    def __call__(self, prev_tokens, enc, enc_pad, train=False,
                 embed_matrix=None):
        c = self.cfg
        D = c.decoder_embed_dim
        B, U = prev_tokens.shape
        if embed_matrix is None:
            embed_matrix = self.param(
                "embed_tokens", nn.initializers.normal(stddev=D ** -0.5),
                (c.vocab_size, D), jnp.float32)
        x = embed_matrix.astype(c.compute_dtype)[prev_tokens] * (D ** 0.5)
        pad_mask = prev_tokens == c.pad
        nonpad = ~pad_mask
        positions = (jnp.cumsum(nonpad.astype(jnp.int32), 1) * nonpad
                     + PADDING_IDX)
        table = sinusoidal_table(U + PADDING_IDX + 2, D)
        x = x + table[positions].astype(x.dtype)

        causal = jnp.triu(jnp.full((U, U), MASK_VALUE, jnp.float32), k=1)
        self_bias = (causal[None, None]
                     + jnp.where(pad_mask, MASK_VALUE, 0.0)[:, None, None, :])
        cross_bias = jnp.where(enc_pad, MASK_VALUE, 0.0)[:, None, None, :]

        for i in range(c.decoder_layers):
            x = TransformerDecoderLayer(
                D, c.decoder_ffn_embed_dim, c.decoder_attention_heads,
                c.dropout, c.attention_dropout,
                normalize_before=c.decoder_normalize_before,
                dtype=c.compute_dtype, name=f"layer_{i}")(
                    x, enc, self_bias, cross_bias, deterministic=not train)
        if c.decoder_normalize_before:
            x = LayerNorm(D, name="layer_norm")(x)
        logits = jnp.einsum("bud,vd->buv", x.astype(jnp.float32),
                            embed_matrix.astype(jnp.float32))
        return logits


class Wav2Vec2Seq2Seq(nn.Module):
    """Encoder-decoder fine-tune head (wav2vec2_asr.py:247)."""

    w2v_cfg: Wav2Vec2Config
    cfg: CaatConfig
    encoder_type: str = "blockwise"

    def setup(self):
        self.encoder = Wav2Vec2Model(self.w2v_cfg,
                                     encoder_type=self.encoder_type)
        self.decoder = Seq2SeqDecoder(self.cfg)

    def encode(self, source, padding_mask=None, main_context=None,
               right_context=None, train=False):
        enc, pad = self.encoder.extract_features(
            source, padding_mask, main_context, right_context, train)
        if pad is None:
            pad = jnp.zeros(enc.shape[:2], bool)
        return enc, pad

    def __call__(self, source, prev_tokens, padding_mask=None,
                 main_context=None, right_context=None, train=False):
        enc, enc_pad = self.encode(source, padding_mask, main_context,
                                   right_context, train)
        return self.decoder(prev_tokens, enc, enc_pad, train=train)

    def decode_logits(self, prev_tokens, enc, enc_pad):
        return self.decoder(prev_tokens, enc, enc_pad, train=False)
