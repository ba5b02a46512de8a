"""CAAT jointer: grouped cross-attention from decoder states to encoder
prefixes.

Behavioral twin of ``ExpandMultiheadAttention`` / ``TransformerJointerLayer``
/ ``MHAJointNet`` (rain/layers/attention_transducer.py:591-851): the jointer
evaluates every decoder state against G different *source prefixes* (group g
sees encoder frames ``t < (g+1) * downsample``) so the transducer lattice
[B, G, U+1] is produced in one batched pass.

TPU-first redesign: the reference broadcasts queries across groups inside a
bmm and then permutes 5-D tensors; here the whole thing is a pair of einsums
over [B, G, U, H, Dh] with an additive [B, G, S] group bias — XLA maps both
contractions straight onto the MXU and fuses the bias add into the softmax.
Keys/values are computed once per layer (not per group).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from wav2vec_s_tpu.models.caat.config import CaatConfig
from wav2vec_s_tpu.models.modules import LayerNorm
from wav2vec_s_tpu.ops.block_mask import MASK_VALUE


def num_groups(src_len: int, downsample: int) -> int:
    return max(1, math.ceil(src_len / downsample))


def group_attn_bias(src_len: int, downsample: int,
                    padding_mask: Optional[jnp.ndarray] = None,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Additive bias [1|B, G, S]: group g attends to frames t < (g+1)*ds.

    (reference ``_gen_group_mask``, attention_transducer.py:810-824; finite
    mask value keeps fully-padded rows NaN-free.)
    """
    G = num_groups(src_len, downsample)
    limits = (jnp.arange(1, G + 1) * downsample)[:, None]        # [G, 1]
    t = jnp.arange(src_len)[None, :]                             # [1, S]
    bias = jnp.where(limits <= t, MASK_VALUE, 0.0).astype(dtype)[None]
    if padding_mask is not None:
        bias = bias + jnp.where(padding_mask, MASK_VALUE, 0.0
                                ).astype(dtype)[:, None, :]
    return bias


def group_lengths(padding_mask: jnp.ndarray, downsample: int) -> jnp.ndarray:
    """[B] number of valid groups = ceil(nonpad_len / ds)."""
    lens = jnp.sum(~padding_mask, axis=1)
    return jnp.ceil(lens / downsample).astype(jnp.int32)


class ExpandMultiheadAttention(nn.Module):
    """Cross-attention evaluated under G group biases at once.

    query: [B, G, U, D] (or [B, U, D], broadcast over groups);
    key/value source: [B, S, D]; group_bias: [B|1, G, S] additive.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, source, group_bias=None,
                 deterministic: bool = True):
        D, H = self.embed_dim, self.num_heads
        Dh = D // H
        dense = lambda name: nn.Dense(D, dtype=self.dtype, name=name)
        squeeze_groups = query.ndim == 3
        if squeeze_groups:
            query = query[:, None]
        B, G, U, _ = query.shape
        S = source.shape[1]

        q = dense("q_proj")(query).reshape(B, G, U, H, Dh)
        k = dense("k_proj")(source).reshape(B, S, H, Dh)
        v = dense("v_proj")(source).reshape(B, S, H, Dh)

        logits = jnp.einsum("bguhd,bshd->bhgus", q, k,
                            preferred_element_type=jnp.float32) * (Dh ** -0.5)
        if group_bias is not None:
            logits = logits + group_bias[:, None, :, None, :].astype(logits.dtype)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        if self.dropout > 0 and not deterministic:
            from wav2vec_s_tpu.ops.dropout import hw_dropout
            probs = hw_dropout(probs, self.dropout, self.make_rng("dropout"))
        out = jnp.einsum("bhgus,bshd->bguhd", probs, v)
        # the group axis may have been broadcast up by the bias (queries are
        # shared across groups in the first layer) — size it from the result
        out = out.reshape(B, out.shape[1], U, D)
        return dense("out_proj")(out)


class TransformerJointerLayer(nn.Module):
    cfg: CaatConfig

    @nn.compact
    def __call__(self, x, source, group_bias=None, deterministic=True):
        c = self.cfg
        D = c.jointer_embed_dim
        residual = x if x.ndim == 4 else x[:, None]
        h = x
        ln_attn = LayerNorm(D, name="attn_layer_norm")
        ln_final = LayerNorm(D, name="final_layer_norm")
        if c.decoder_normalize_before:
            h = ln_attn(h)
        h = ExpandMultiheadAttention(
            D, c.jointer_attention_heads, c.attention_dropout,
            dtype=c.compute_dtype, name="enc_attn")(
                h, source, group_bias, deterministic)

        def drop(t, rate):
            if rate == 0 or deterministic:
                return t
            from wav2vec_s_tpu.ops.dropout import hw_dropout
            return hw_dropout(t, rate, self.make_rng("dropout"))

        x = residual + drop(h, c.dropout)
        if not c.decoder_normalize_before:
            x = ln_attn(x)
        residual = x
        h = ln_final(x) if c.decoder_normalize_before else x
        h = jax.nn.relu(nn.Dense(c.jointer_ffn_embed_dim,
                                 dtype=c.compute_dtype, name="fc1")(h))
        h = drop(h, c.activation_dropout)
        h = nn.Dense(D, dtype=c.compute_dtype, name="fc2")(h)
        x = residual + drop(h, c.dropout)
        if not c.decoder_normalize_before:
            x = ln_final(x)
        return x


class MHAJointNet(nn.Module):
    """N jointer layers; returns joint states [B, G, U+1, D].

    ``downsample`` is static per call — the sampled decision-step schedule
    (reference :800-815) picks from ``cfg.sampled_steps`` host-side, one
    compiled executable per step size.
    """

    cfg: CaatConfig

    @nn.compact
    def __call__(self, decoder_state, encoder_out, encoder_padding_mask,
                 downsample: Optional[int] = None, deterministic=True):
        c = self.cfg
        ds = downsample if downsample is not None else c.transducer_downsample
        S = encoder_out.shape[1]
        if ds > 0:
            bias = group_attn_bias(S, ds, encoder_padding_mask,
                                   dtype=jnp.float32)
        else:  # single full-context group (offline / incremental last-step)
            bias = jnp.where(encoder_padding_mask, MASK_VALUE, 0.0
                             ).astype(jnp.float32)[:, None, :]
        x = decoder_state
        for i in range(c.jointer_layers):
            x = TransformerJointerLayer(c, name=f"layer_{i}")(
                x, encoder_out, bias, deterministic)
        return x
