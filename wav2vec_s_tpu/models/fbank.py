"""fbank (pre-wav2vec) CAAT model family.

Twins of the reference's filterbank stack (rain/layers/audio_convs.py:50-385
conv front-ends, rain/layers/unidirect_encoder.py blockwise audio encoder,
rain/models/transducer.py:106 / caat_transformer.py:104 models, and the
simpler jointers rain/layers/attention_transducer.py:458-586):

- ``Shallow2dConv`` / ``Vgg2dConv`` — 2-D conv front-ends over [B, T, 80]
  log-mel features with 4x time downsampling;
- ``FbankBlockwiseEncoder`` — sinusoidal positions + the same blockwise
  bounded-context attention as the wav2vec-S encoder (shared block-mask
  machinery; mc/rc are counted in *post-conv* frames here);
- ``ConcatJointNet`` / ``AttentionJointNet`` — the single-layer jointer
  variants; the full MHA jointer is shared with the w2v2 CAAT model;
- ``FbankCaatModel`` — encoder + IsolatedDecoder LM + selectable jointer,
  trained with the same ``caat_loss``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from wav2vec_s_tpu.models.caat.config import CaatConfig
from wav2vec_s_tpu.models.caat.decoder import IsolatedDecoder
from wav2vec_s_tpu.models.caat.jointer import (
    MHAJointNet, group_attn_bias, group_lengths)
from wav2vec_s_tpu.models.modules import LayerNorm
from wav2vec_s_tpu.models.wav2vec2 import (
    EncoderLayers, Wav2Vec2Config)
from wav2vec_s_tpu.ops import (
    block_layout, append_right_context, strip_right_context,
    extend_padding_mask, block_attn_bias)
from wav2vec_s_tpu.ops.block_mask import MASK_VALUE
from wav2vec_s_tpu.utils.positional import sinusoidal_positions_from_padding


class Shallow2dConv(nn.Module):
    """2x (conv2d k3 s2) over [B, T, F] -> [B, T/4, D]
    (audio_convs.py shallow2d_base)."""

    out_dim: int = 768
    channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        B, T, F = feats.shape
        x = feats[:, :, :, None]
        x = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, name="conv_0")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, name="conv_1")(x)
        x = jax.nn.relu(x)
        B, T4, F4, C = x.shape
        x = x.reshape(B, T4, F4 * C)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(x)


class Vgg2dConv(nn.Module):
    """VGG-style front-end: 2 blocks of (conv, conv, maxpool s2)."""

    out_dim: int = 768
    channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = feats[:, :, :, None]
        for b, ch in enumerate((self.channels, self.channels * 2)):
            for i in range(2):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv_{b}_{i}")(x)
                x = jax.nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        B, T4, F4, C = x.shape
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(
            x.reshape(B, T4, F4 * C))


class ResNetBasicBlock(nn.Module):
    """3x3-3x3 residual block (audio_convs.py:227-258 ``BasicBlock``).

    BatchNorm2d becomes GroupNorm: batch-size independent and stateless
    under jit/SPMD — no mutable running-stats collection to thread through
    the functional train step (the TPU-first trade; same normalization
    role).
    """

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda s, n: nn.Conv(self.planes, (3, 3), strides=(s, s),
                                    padding="SAME", use_bias=False,
                                    dtype=self.dtype, name=n)
        gn = lambda n: nn.GroupNorm(num_groups=min(32, self.planes),
                                    dtype=self.dtype, name=n)
        out = jax.nn.relu(gn("bn1")(conv(self.stride, "conv1")(x)))
        out = gn("bn2")(conv(1, "conv2")(out))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.GroupNorm(num_groups=min(32, self.planes),
                             dtype=self.dtype, name="down_bn")(
                nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype,
                        name="down_conv")(x))
        return jax.nn.relu(out + x)


class ResNetConv(nn.Module):
    """ResNet conv front-end (audio_convs.py:296-371 ``ResNet`` /
    ``Resnet_Base``): 3x3 stem then stages of BasicBlocks, stride 2 per
    stage (4x time downsample for the base config), flattened channels x
    mel projected to ``out_dim``."""

    out_dim: int = 768
    channels: int = 64                         # stem width
    res_config: tuple = ((64, 2, 4), (128, 2, 4))   # RESNET_CONFIG_BASE
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = feats[:, :, :, None]                          # [B, T, F, 1]
        x = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = jax.nn.relu(nn.GroupNorm(num_groups=min(32, self.channels),
                                     dtype=self.dtype, name="bn1")(x))
        for si, (planes, stride, nlayers) in enumerate(self.res_config):
            for li in range(nlayers):
                x = ResNetBasicBlock(
                    planes, stride if li == 0 else 1, dtype=self.dtype,
                    name=f"stage_{si}_block_{li}")(x)
        B, T4, F4, C = x.shape
        return nn.Dense(self.out_dim, dtype=self.dtype, name="out_proj")(
            x.reshape(B, T4, F4 * C))


def resnet_small(out_dim=768, **kw):
    return ResNetConv(out_dim, res_config=((64, 2, 2), (128, 2, 2)), **kw)


CONV_FRONTENDS = {"shallow2d": Shallow2dConv, "vgg2d": Vgg2dConv,
                  "resnet": ResNetConv, "resnet_small": resnet_small}


def downsample_mask(padding_mask, t_out):
    B, T = padding_mask.shape
    extra = T % t_out
    if extra:
        padding_mask = padding_mask[:, :-extra]
    return padding_mask.reshape(B, t_out, -1).all(-1)


class FbankBlockwiseEncoder(nn.Module):
    cfg: Wav2Vec2Config          # reuse encoder hyperparameter block
    conv_type: str = "shallow2d"

    @nn.compact
    def __call__(self, feats, padding_mask=None, main_context=None,
                 right_context=None, train=False):
        c = self.cfg
        x = CONV_FRONTENDS[self.conv_type](
            c.encoder_embed_dim, dtype=c.compute_dtype, name="subsample")(feats)
        if padding_mask is None:
            pm = jnp.zeros(x.shape[:2], bool)
        else:
            pm = downsample_mask(padding_mask, x.shape[1])
        x = x + sinusoidal_positions_from_padding(
            pm, c.encoder_embed_dim, dtype=x.dtype)
        if not c.layer_norm_first:
            x = LayerNorm(c.encoder_embed_dim, name="layer_norm")(x)
        mc = main_context if main_context is not None else c.main_context
        rc = right_context if right_context is not None else c.right_context
        T = x.shape[1]
        layout = block_layout(T, mc, rc)
        x = append_right_context(x, layout)
        bias = block_attn_bias(layout, pm, dtype=jnp.float32)
        x = EncoderLayers(c, name="layers")(x, bias, train)
        x = strip_right_context(x, layout)
        if c.layer_norm_first:
            x = LayerNorm(c.encoder_embed_dim, name="layer_norm")(x)
        return x, pm


class ConcatJointNet(nn.Module):
    """Additive jointer: tanh(W_enc h_t + W_dec h_u)
    (attention_transducer.py:458-506) expanded over source groups via mean
    pooling of each group's visible frames."""

    cfg: CaatConfig

    @nn.compact
    def __call__(self, decoder_state, enc, enc_pad, downsample=None,
                 deterministic=True):
        c = self.cfg
        ds = downsample if downsample is not None else c.transducer_downsample
        D = c.jointer_embed_dim
        bias = group_attn_bias(enc.shape[1], max(ds, enc.shape[1]) if ds <= 0
                               else ds, enc_pad)                 # [B,G,S]
        w = jax.nn.softmax(bias, axis=-1)                        # mean pool
        pooled = jnp.einsum("bgs,bsd->bgd", w.astype(enc.dtype), enc)
        h_enc = nn.Dense(D, dtype=c.compute_dtype, name="enc_proj")(pooled)
        h_dec = nn.Dense(D, dtype=c.compute_dtype, name="dec_proj")(
            decoder_state)
        joint = jnp.tanh(h_enc[:, :, None, :] + h_dec[:, None, :, :])
        return joint


class AttentionJointNet(nn.Module):
    """Single einsum-attention jointer (attention_transducer.py:509-586)."""

    cfg: CaatConfig

    @nn.compact
    def __call__(self, decoder_state, enc, enc_pad, downsample=None,
                 deterministic=True):
        c = self.cfg
        ds = downsample if downsample is not None else c.transducer_downsample
        D = c.jointer_embed_dim
        q = nn.Dense(D, dtype=c.compute_dtype, name="q_proj")(decoder_state)
        k = nn.Dense(D, dtype=c.compute_dtype, name="k_proj")(enc)
        v = nn.Dense(D, dtype=c.compute_dtype, name="v_proj")(enc)
        logits = jnp.einsum("bud,bsd->bus", q, k,
                            preferred_element_type=jnp.float32) * D ** -0.5
        bias = group_attn_bias(enc.shape[1], max(ds, enc.shape[1]) if ds <= 0
                               else ds, enc_pad)                 # [B,G,S]
        logits = logits[:, None] + bias[:, :, None, :]           # [B,G,U,S]
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        att = jnp.einsum("bgus,bsd->bgud", p, v)
        return jnp.tanh(att + decoder_state[:, None])


JOINTERS = {"mha": MHAJointNet, "concat": ConcatJointNet,
            "attention": AttentionJointNet}


class FbankCaatModel(nn.Module):
    """CAAT on 80-d log-mel features (rain arch family ``transducer`` /
    ``caat_transformer``)."""

    enc_cfg: Wav2Vec2Config
    cfg: CaatConfig
    conv_type: str = "shallow2d"
    jointer_type: str = "mha"

    def setup(self):
        self.encoder = FbankBlockwiseEncoder(self.enc_cfg, self.conv_type)
        self.decoder_lm = IsolatedDecoder(self.cfg)
        self.jointer = JOINTERS[self.jointer_type](self.cfg)
        c = self.cfg
        self.embed_tokens = self.param(
            "embed_tokens",
            nn.initializers.normal(stddev=c.decoder_embed_dim ** -0.5),
            (c.vocab_size, c.decoder_embed_dim), jnp.float32)

    def __call__(self, feats, prev_tokens, padding_mask=None,
                 main_context=None, right_context=None,
                 downsample: Optional[int] = None, train=False):
        enc, enc_pad = self.encoder(feats, padding_mask, main_context,
                                    right_context, train)
        h_lm = self.decoder_lm(prev_tokens, train=train,
                               embed_matrix=self.embed_tokens)
        joint = self.jointer(h_lm, enc, enc_pad, downsample,
                             deterministic=not train)
        ds = downsample if downsample is not None else self.cfg.transducer_downsample
        if ds > 0:
            glens = group_lengths(enc_pad, ds)
        else:
            glens = jnp.ones(enc.shape[0], jnp.int32)
        return joint, glens

    def encode(self, feats, padding_mask=None, main_context=None,
               right_context=None, train=False):
        return self.encoder(feats, padding_mask, main_context,
                            right_context, train)

    def decode_step(self, prev_tokens, token_lens, enc, enc_pad):
        """Next-symbol log-probs (same recompute contract as
        ``W2V2CaatModel.decode_step``) — gives the fbank family the same
        streaming/validation decode surface."""
        h_lm = self.decoder_lm(prev_tokens, train=False,
                               embed_matrix=self.embed_tokens)
        k = jnp.arange(h_lm.shape[0])
        h_last = h_lm[k, token_lens - 1][:, None]          # [K, 1, D]
        joint = self.jointer(h_last, enc, enc_pad, downsample=-1,
                             deterministic=True)           # [K, 1, 1, D]
        logits = jnp.einsum("...d,vd->...v", joint[:, 0, 0].astype(
            jnp.float32), self.embed_tokens.astype(jnp.float32))
        return jax.nn.log_softmax(logits, axis=-1)
