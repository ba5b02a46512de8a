"""Gumbel-softmax vector quantizer (contrastive targets).

Behavioral twin of fairseq ``GumbelVectorQuantizer``
(fairseq/fairseq/modules/gumbel_vector_quantizer.py:11-202): G groups x V
codes, straight-through gumbel-softmax selection with an exponentially decayed
temperature, code/prob perplexity diagnostics.

TPU-first: the codebook combine is a single [BT, G*V] x [G*V, D/G]-style
einsum (MXU) instead of scatter/index ops; temperature is a traced scalar so
the anneal schedule does not trigger recompilation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def gumbel_temperature(num_updates, max_temp: float, min_temp: float,
                       decay: float):
    """max_temp * decay**n clamped at min_temp (reference :85-88)."""
    return jnp.maximum(max_temp * decay ** num_updates.astype(jnp.float32),
                       min_temp)


class GumbelVectorQuantizer(nn.Module):
    input_dim: int
    num_vars: int = 320          # V, codes per group
    groups: int = 2              # G
    vq_dim: int = 256            # output dim (split across groups)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temperature, *,
                 train: bool = False) -> dict:
        """x: [B, T, C] -> dict(x=[B, T, vq_dim], perplexities, ...)."""
        B, T, C = x.shape
        G, V = self.groups, self.num_vars
        assert self.vq_dim % G == 0
        var_dim = self.vq_dim // G

        logits = nn.Dense(G * V, dtype=self.dtype, name="weight_proj")(x)
        logits = logits.reshape(B * T, G, V).astype(jnp.float32)

        # codebook: [1, G*V, var_dim] like the reference's ``vars`` param
        codebook = self.param(
            "vars", nn.initializers.uniform(scale=1.0), (1, G * V, var_dim),
            jnp.float32)

        hard_idx = jnp.argmax(logits, axis=-1)                      # [BT, G]
        hard_onehot = jax.nn.one_hot(hard_idx, V, dtype=jnp.float32)

        hard_probs = hard_onehot.mean(axis=0)                       # [G, V]
        code_ppl = jnp.exp(
            -jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), axis=-1)).sum()
        avg_probs = jax.nn.softmax(logits, axis=-1).mean(axis=0)    # [G, V]
        prob_ppl = jnp.exp(
            -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1)).sum()

        if train:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(self.make_rng("gumbel"), logits.shape,
                                   minval=1e-10, maxval=1.0) + 1e-10))
            y_soft = jax.nn.softmax((logits + g) / temperature, axis=-1)
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, V, dtype=jnp.float32)
            sel = y_hard + y_soft - jax.lax.stop_gradient(y_soft)   # ST
            sel_idx = idx
        else:
            sel = hard_onehot
            sel_idx = hard_idx

        # combine with codebook as ONE [BT, G*V] x [G*V, vq_dim] matmul
        # against a block-diagonal codebook (zeros couple nothing across
        # groups) — a single MXU call instead of a G-batched einsum.
        # Measured NEUTRAL vs the grouped einsum at Base pre-train dims
        # (the per-group slices seen in profiles were overlapped DMA, not
        # critical path); kept for the simpler one-call lowering.
        cb = codebook[0].reshape(G, V, var_dim)
        bd = jnp.concatenate(
            [jnp.pad(cb[g], ((0, 0), (g * var_dim,
                                      (G - 1 - g) * var_dim)))
             for g in range(G)], axis=0)                  # [G*V, vq_dim]
        out = (sel.reshape(B * T, G * V) @ bd).reshape(B, T, self.vq_dim)

        return {
            "x": out.astype(self.dtype),
            "code_perplexity": code_ppl,
            "prob_perplexity": prob_ppl,
            "num_vars": G * V,
            "temp": temperature,
            "targets": hard_idx.reshape(B, T, G),
            # codes actually selected by the (gumbel-noised) forward pass:
            # two quantized outputs are equal iff these indices are equal,
            # which lets the contrastive head's neg_is_pos check compare
            # [.., G] ints instead of [.., D] vectors (wav2vec2.py:539-540)
            "sel_codes": sel_idx.reshape(B, T, G),
        }
