"""Shared transformer building blocks (flax.linen).

Behavioral twins of the reference's fairseq modules, named so that torch
checkpoints map 1:1 onto the param tree:

- ``MultiheadSelfAttention``  ~ fairseq MultiheadAttention (self-attention
  path, fairseq/fairseq/modules/multihead_attention.py) — params ``q_proj``,
  ``k_proj``, ``v_proj``, ``out_proj``.
- ``TransformerEncoderLayer`` ~ TransformerSentenceEncoderLayer
  (fairseq/fairseq/models/wav2vec/wav2vec2.py:874-978), post-LN and pre-LN.

TPU-first notes: attention is computed head-batched with einsum on a [B, T, D]
layout (no fairseq [T, B, D] transposes), biases are additive ``-1e4`` masks
(finite, NaN-safe — reference uses the same constant), and all dropout is
resolved at trace time (``deterministic`` flag) so inference graphs contain no
RNG ops.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from wav2vec_s_tpu.ops.dropout import hw_dropout


class FlashSpec(struct.PyTreeNode):
    """Marker passed in place of a dense bias: route attention through the
    block-sparse Pallas kernel (ops/pallas_attention.py)."""

    key_padding_mask: jnp.ndarray            # [B, S] bool, True = pad
    seq_len: int = struct.field(pytree_node=False)
    main_context: int = struct.field(pytree_node=False)
    right_context: int = struct.field(pytree_node=False)


def grad_multiply(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Identity forward, gradient scaled by ``scale``.

    Twin of fairseq ``GradMultiply`` used for ``feature_grad_mult``
    (wav2vec2.py:636-641).
    """
    if scale == 1.0:
        return x
    # stop_gradient formulation: f(x) = sg(x) + scale * (x - sg(x))
    return jax.lax.stop_gradient(x) * (1.0 - scale) + x * scale


def fp32_layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm computed in fp32 regardless of activation dtype.

    Matches fairseq ``Fp32LayerNorm`` / amp behavior on the reference side;
    keeps bf16 training numerically stable on TPU.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return fp32_layer_norm(x, scale, bias, self.eps)


class Fp32GroupNorm(nn.Module):
    """GroupNorm over [B, T, C] in fp32.

    With ``num_groups == C`` (the wav2vec 2.0 conv front-end case,
    wav2vec2.py:741-745) each channel is normalized over time independently.
    """

    num_groups: int
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        dtype = x.dtype
        B, T, C = x.shape
        g = self.num_groups
        x32 = x.astype(jnp.float32).reshape(B, T, g, C // g)
        mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
        var = jnp.var(x32, axis=(1, 3), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y.reshape(B, T, C) * scale + bias
        return y.astype(dtype)


def dot_product_attention(
    q: jnp.ndarray,  # [B, H, Tq, Dh]
    k: jnp.ndarray,  # [B, H, Tk, Dh]
    v: jnp.ndarray,  # [B, H, Tk, Dh]
    bias: Optional[jnp.ndarray],  # broadcastable to [B, H, Tq, Tk]
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    dh = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (dh ** -0.5)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        probs = hw_dropout(probs, dropout_rate, dropout_rng)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


class MultiheadSelfAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None, deterministic: bool = True,
                 kv: Optional[jnp.ndarray] = None):
        """x: [B, Tq, D]; kv (optional): [B, Tk, D] source for keys/values.

        ``bias`` is an additive mask broadcastable to [B, H, Tq, Tk].
        """
        D, H = self.embed_dim, self.num_heads
        dense = lambda name: nn.Dense(D, dtype=self.dtype, name=name)
        src = x if kv is None else kv
        q = dense("q_proj")(x)
        k = dense("k_proj")(src)
        v = dense("v_proj")(src)

        def split(t):
            B, T, _ = t.shape
            return t.reshape(B, T, H, D // H).transpose(0, 2, 1, 3)

        if isinstance(bias, FlashSpec):
            from wav2vec_s_tpu.ops.pallas_attention import (
                blockwise_flash_attention_packed)
            rate, rng = 0.0, None
            if self.dropout > 0.0 and not deterministic:
                rate, rng = self.dropout, self.make_rng("dropout")
            # packed [B, T, H*Dh] entry point: the wrapper relayouts to
            # per-head blocks with dh UNPADDED (no 64->128 lane pad)
            out = blockwise_flash_attention_packed(
                q, k, v, bias.key_padding_mask, H,
                bias.seq_len, bias.main_context, bias.right_context,
                dropout_rate=rate, dropout_rng=rng)
        else:
            rng = None
            if self.dropout > 0.0 and not deterministic:
                rng = self.make_rng("dropout")
            out = dot_product_attention(
                split(q), split(k), split(v), bias,
                dropout_rate=self.dropout, deterministic=deterministic,
                dropout_rng=rng)
            B, _, Tq, _ = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(B, Tq, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class RelativeMultiheadSelfAttention(nn.Module):
    """Self-attention with Shaw-style relative position embeddings.

    Twin of rain's ``MultiheadRelativeAttention``
    (rain/layers/multihead_attention_relative.py:21-406, used by the fbank
    model variants): attention logits get a content-to-position term from a
    learned table of clipped relative distances; values likewise receive a
    position contribution.
    """

    embed_dim: int
    num_heads: int
    max_relative_position: int = 16
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None, deterministic: bool = True):
        D, H = self.embed_dim, self.num_heads
        Dh = D // H
        B, T, _ = x.shape
        dense = lambda name: nn.Dense(D, dtype=self.dtype, name=name)
        q = dense("q_proj")(x).reshape(B, T, H, Dh)
        k = dense("k_proj")(x).reshape(B, T, H, Dh)
        v = dense("v_proj")(x).reshape(B, T, H, Dh)

        R = self.max_relative_position
        rel_k = self.param("rel_keys", nn.initializers.normal(Dh ** -0.5),
                           (2 * R + 1, Dh), jnp.float32)
        rel_v = self.param("rel_values", nn.initializers.normal(Dh ** -0.5),
                           (2 * R + 1, Dh), jnp.float32)
        dist = jnp.clip(jnp.arange(T)[None, :] - jnp.arange(T)[:, None],
                        -R, R) + R                                  # [T,T]

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        rel_logits = jnp.einsum("bqhd,qkd->bhqk", q.astype(jnp.float32),
                                rel_k[dist])
        logits = (logits + rel_logits) * (Dh ** -0.5)
        if bias is not None:
            logits = logits + bias.astype(logits.dtype)
        p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        if self.dropout > 0 and not deterministic:
            p = hw_dropout(p, self.dropout, self.make_rng("dropout"))
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        out = out + jnp.einsum("bhqk,qkd->bqhd", p.astype(jnp.float32),
                               rel_v[dist]).astype(out.dtype)
        return dense("out_proj")(out.reshape(B, T, D))


class TransformerEncoderLayer(nn.Module):
    """Post-/pre-LN transformer layer (wav2vec2.py:874-978)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    layer_norm_first: bool = False
    activation: Callable = jax.nn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None, deterministic: bool = True):
        attn = MultiheadSelfAttention(
            self.embed_dim, self.num_heads, self.attention_dropout,
            dtype=self.dtype, name="self_attn")
        ln_attn = LayerNorm(self.embed_dim, name="self_attn_layer_norm")
        ln_final = LayerNorm(self.embed_dim, name="final_layer_norm")
        fc1 = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")

        def drop(t, rate):
            if rate == 0.0 or deterministic:
                return t
            return hw_dropout(t, rate, self.make_rng("dropout"))

        act = lambda t: self.activation(t, approximate=False) \
            if self.activation is jax.nn.gelu else self.activation(t)

        if self.layer_norm_first:
            h = ln_attn(x)
            h = attn(h, bias, deterministic)
            x = x + drop(h, self.dropout)
            h = ln_final(x)
            h = fc2(drop(act(fc1(h)), self.activation_dropout))
            return x + drop(h, self.dropout)
        else:
            h = attn(x, bias, deterministic)
            x = ln_attn(x + drop(h, self.dropout))
            h = fc2(drop(act(fc1(x)), self.activation_dropout))
            return ln_final(x + drop(h, self.dropout))
