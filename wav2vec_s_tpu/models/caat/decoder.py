"""IsolatedDecoder: the CAAT causal LM over target prefixes.

Behavioral twin of the reference's ``IsolatedDecoder`` (rain/layers/
attention_transducer.py:60-287) — a fairseq ``TransformerDecoder`` with
``no_encoder_attn=True``: scaled token embedding + sinusoidal positions with a
random training-time start offset (rain/layers/rand_pos.py:43-126,
``rand_pos_decoder=30``), pre-LN self-attention-only layers (relu FFN), final
layer norm, no output projection (hidden states feed the jointer).

The incremental-decode path (KV cache) lives in ``stream/``; this module is
the parallel teacher-forcing form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from wav2vec_s_tpu.models.caat.config import CaatConfig
from wav2vec_s_tpu.models.modules import LayerNorm, TransformerEncoderLayer
from wav2vec_s_tpu.ops.block_mask import MASK_VALUE
from wav2vec_s_tpu.utils.positional import sinusoidal_table, PADDING_IDX


class IsolatedDecoder(nn.Module):
    cfg: CaatConfig

    @nn.compact
    def __call__(self, prev_tokens: jnp.ndarray, train: bool = False,
                 embed_matrix: jnp.ndarray | None = None):
        """prev_tokens: [B, U+1] = [bos; targets] -> hidden [B, U+1, D].

        ``embed_matrix`` (optional [V, D]) lets the parent model share the
        token embedding with the output projection
        (``--share-decoder-input-output-embed`` in the reference recipe).
        """
        c = self.cfg
        D = c.decoder_embed_dim
        B, U1 = prev_tokens.shape

        if embed_matrix is None:
            embed_matrix = self.param(
                "embed_tokens", nn.initializers.normal(stddev=D ** -0.5),
                (c.vocab_size, D), jnp.float32)
        x = embed_matrix.astype(c.compute_dtype)[prev_tokens] * (D ** 0.5)

        # sinusoidal positions, fairseq offset; random start during training
        pad_mask = prev_tokens == c.pad
        nonpad = ~pad_mask
        positions = (jnp.cumsum(nonpad.astype(jnp.int32), axis=1) * nonpad
                     + PADDING_IDX)
        if train and c.rand_pos_decoder > 0:
            offset = jax.random.randint(
                self.make_rng("rand_pos"), (B, 1), 0, c.rand_pos_decoder)
            positions = positions + offset * nonpad
        table = sinusoidal_table(U1 + PADDING_IDX + 1 + c.rand_pos_decoder, D)
        x = x + table[positions].astype(x.dtype)

        if c.dropout > 0 and train:
            from wav2vec_s_tpu.ops.dropout import hw_dropout
            x = hw_dropout(x, c.dropout, self.make_rng("dropout"))

        # causal + padding bias
        causal = jnp.triu(jnp.full((U1, U1), MASK_VALUE, jnp.float32), k=1)
        bias = causal[None, None]
        bias = bias + jnp.where(pad_mask, MASK_VALUE, 0.0)[:, None, None, :]

        for i in range(c.decoder_layers):
            x = TransformerEncoderLayer(
                embed_dim=D,
                ffn_dim=c.decoder_ffn_embed_dim,
                num_heads=c.decoder_attention_heads,
                dropout=c.dropout,
                attention_dropout=c.attention_dropout,
                activation_dropout=c.activation_dropout,
                layer_norm_first=c.decoder_normalize_before,
                activation=jax.nn.relu,
                dtype=c.compute_dtype,
                name=f"layer_{i}")(x, bias, deterministic=not train)

        if c.decoder_normalize_before:
            x = LayerNorm(D, name="layer_norm")(x)
        return x
