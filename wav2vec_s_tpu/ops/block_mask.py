"""Block-wise bounded-context attention layout (the wav2vec-S core mechanism).

Semantics (behavioral twin of reference ``gen_block_attn_mask``,
fairseq/fairseq/models/wav2vec/wav2vec_S.py:444-489, inference twin
rain/layers/unidirect_w2v2_encoder.py:68-115):

- The sequence is divided into blocks of ``main_context`` (mc) frames;
  ``block(t) = t // mc``.
- Each block ``b`` gets ``right_context`` (rc) *look-ahead copies*: duplicates
  of frames ``[(b+1)*mc, (b+1)*mc + rc)``.  They are appended to the sequence
  (length becomes ``T + rc * num_full_blocks``) so that a *cached* prefix stays
  valid when streaming: the copies are processed with context restricted to
  their own block, unlike the original frames at the same positions, which see
  one block more.
- Attention rule (True = may attend):
  * an original frame in block ``b`` attends to all original frames of blocks
    ``<= b`` (note: including *future frames inside its own block*) and to the
    rc copies of block ``b``;
  * the rc copies of block ``b`` behave like members of block ``b``.
- Mask is applied as an additive ``-1e4`` bias (not ``-inf``; NaN safety when a
  row is fully padded, reference unidirect_w2v2_encoder.py:155-159).

TPU-first design notes: for static (T, mc, rc) the whole layout is a
compile-time constant — computed once in numpy, cached, and baked into the XLA
executable; the rc duplication is one static gather.  Sampled-context training
draws (mc, rc) from a small bucket set so each combination compiles once.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax.numpy as jnp

MASK_VALUE = -1e4


@dataclasses.dataclass(frozen=True)
class BlockLayout:
    seq_len: int
    main_context: int
    right_context: int
    num_blocks: int           # number of blocks that receive rc copies
    rc_len: int               # total appended frames R = rc * num_blocks
    rc_idx: np.ndarray        # [R] source index of each rc copy (clamped)
    rc_invalid: np.ndarray    # [R] True where the copy points past the end
    allowed: np.ndarray       # [T+R, T+R] True = query row may attend to key col

    @property
    def total_len(self) -> int:
        return self.seq_len + self.rc_len


@functools.lru_cache(maxsize=64)
def block_layout(seq_len: int, main_context: int, right_context: int) -> BlockLayout:
    T, mc, rc = seq_len, main_context, right_context
    block_idx = np.arange(T) // mc
    if rc == 0:
        allowed = block_idx[:, None] >= block_idx[None, :]
        return BlockLayout(T, mc, rc, 0, 0,
                           np.zeros(0, np.int32), np.zeros(0, bool), allowed)

    num_blocks = T // mc
    # rc copies of block b duplicate the first rc frames of block b+1's range.
    rc_block = np.repeat(np.arange(num_blocks), rc)                # [R]
    rc_idx = ((np.arange(num_blocks)[:, None] + 1) * mc
              + np.arange(rc)[None, :]).reshape(-1)                # [R]
    rc_invalid = rc_idx > (T - 1)
    rc_idx = np.clip(rc_idx, 0, T - 1)

    full_idx = np.concatenate([block_idx, rc_block])               # [T+R]
    # original keys: query (effective block q) sees key frame k iff q >= block(k)
    allowed_orig = full_idx[:, None] >= block_idx[None, :]
    # rc-copy keys: only visible to queries of the same effective block
    allowed_rc = full_idx[:, None] == rc_block[None, :]
    allowed = np.concatenate([allowed_orig, allowed_rc], axis=1)
    return BlockLayout(T, mc, rc, num_blocks, rc * num_blocks,
                       rc_idx.astype(np.int32), rc_invalid, allowed)


def append_right_context(x: jnp.ndarray, layout: BlockLayout) -> jnp.ndarray:
    """[B, T, D] -> [B, T+R, D]: append the look-ahead copies (static gather)."""
    if layout.rc_len == 0:
        return x
    rc = x[:, jnp.asarray(layout.rc_idx), :]
    return jnp.concatenate([x, rc], axis=1)


def strip_right_context(x: jnp.ndarray, layout: BlockLayout) -> jnp.ndarray:
    """[B, T+R, D] -> [B, T, D] after the layer stack (wav2vec_S.py:426-427)."""
    return x[:, : layout.seq_len]


def extend_padding_mask(padding_mask: jnp.ndarray, layout: BlockLayout) -> jnp.ndarray:
    """[B, T] bool (True = pad) -> [B, T+R]; out-of-range copies are pad."""
    if layout.rc_len == 0:
        return padding_mask
    rc_pad = padding_mask[:, jnp.asarray(layout.rc_idx)] | jnp.asarray(layout.rc_invalid)[None, :]
    return jnp.concatenate([padding_mask, rc_pad], axis=1)


def block_attn_bias(
    layout: BlockLayout,
    padding_mask: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Additive attention bias.

    Returns [1, 1, S, S] (structural only) or [B, 1, S, S] when a padding mask
    is given, with S = T + R; masked entries get ``MASK_VALUE``.
    """
    struct = jnp.where(jnp.asarray(layout.allowed), 0.0, MASK_VALUE).astype(dtype)
    bias = struct[None, None]
    if padding_mask is not None:
        ext = extend_padding_mask(padding_mask, layout)
        key_bias = jnp.where(ext, MASK_VALUE, 0.0).astype(dtype)
        bias = bias + key_bias[:, None, None, :]
    return bias
