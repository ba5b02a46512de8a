"""Sinusoidal positional embeddings with fairseq-compatible indexing.

The reference builds its streaming encoders on fairseq's
``SinusoidalPositionalEmbedding`` with ``padding_idx=1`` and feeds it the
boolean padding mask as if it were a token tensor (reference:
fairseq/fairseq/models/wav2vec/wav2vec_S.py:340-347,359 and
rain/layers/unidirect_w2v2_encoder.py:241-276).  The net effect:

- table row ``p`` holds the embedding of absolute position ``p``;
- the first real (non-padded) frame uses row ``padding_idx + 1 = 2``; the
  i-th real frame uses row ``i + 2`` (positions count only non-pad frames);
- padded frames receive the all-zero row at ``padding_idx``.

We reproduce those semantics exactly (they matter for loading the published
checkpoints) but as pure functions over static shapes: the table is a
deterministic function of (length, dim), computed at trace time, so XLA bakes
it in as a constant — no embedding lookup or host RNG in the hot path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

PADDING_IDX = 1
POS_OFFSET = PADDING_IDX + 1  # first real position uses row 2


@functools.lru_cache(maxsize=16)
def _sinusoidal_table_np(num_embeddings: int, dim: int) -> np.ndarray:
    """fairseq-layout sinusoidal table: [sin | cos] halves, zero pad row."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(np.log(10000.0) / (half - 1)))
    args = np.arange(num_embeddings, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_embeddings, 1))], axis=1)
    table[PADDING_IDX, :] = 0.0
    return table.astype(np.float32)


def sinusoidal_table(num_embeddings: int, dim: int) -> jnp.ndarray:
    return jnp.asarray(_sinusoidal_table_np(num_embeddings, dim))


def sinusoidal_positions_from_padding(
    padding_mask: jnp.ndarray, dim: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Positional embeddings for a [B, T] boolean padding mask (True = pad).

    Equivalent to fairseq ``make_positions`` on the bool mask: position of the
    i-th *non-pad* frame is ``i + 2``; pad frames map to the zero row.
    """
    B, T = padding_mask.shape
    nonpad = ~padding_mask
    positions = jnp.cumsum(nonpad.astype(jnp.int32), axis=1) * nonpad + PADDING_IDX
    table = sinusoidal_table(T + POS_OFFSET + 1, dim)
    return table[positions].astype(dtype)
