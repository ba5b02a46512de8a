"""Block-attention layout tests.

Checks the layout against a brute-force, per-element statement of the spec
(reference semantics at wav2vec_S.py:444-489): queries in effective block q
attend to original frames of blocks <= q and to their own block's rc copies
only.
"""

import numpy as np
import jax.numpy as jnp

from wav2vec_s_tpu.ops import (
    block_layout,
    append_right_context,
    extend_padding_mask,
    block_attn_bias,
    strip_right_context,
)
from wav2vec_s_tpu.ops.block_mask import MASK_VALUE


def brute_force_allowed(T, mc, rc):
    nb = T // mc
    R = rc * nb
    S = T + R

    def eff_block(i):
        if i < T:
            return i // mc
        return (i - T) // rc  # rc copies are grouped rc-per-block

    def src(i):
        if i < T:
            return i
        b = (i - T) // rc
        return (b + 1) * mc + (i - T) % rc  # may exceed T-1 (invalid copy)

    allowed = np.zeros((S, S), dtype=bool)
    for q in range(S):
        for k in range(S):
            if k < T:
                allowed[q, k] = eff_block(q) >= eff_block(k)
            else:
                allowed[q, k] = eff_block(q) == eff_block(k) - 0 and eff_block(k) == eff_block(q) and True
                allowed[q, k] = eff_block(q) == (k - T) // rc
    return allowed


def test_layout_matches_brute_force():
    for T, mc, rc in [(32, 8, 4), (30, 8, 4), (16, 16, 8), (33, 10, 2), (8, 8, 0)]:
        lay = block_layout(T, mc, rc)
        expect = brute_force_allowed(T, mc, rc)
        assert lay.allowed.shape == expect.shape
        np.testing.assert_array_equal(lay.allowed, expect)


def test_rc_indices_and_invalid():
    lay = block_layout(32, 8, 4)
    # 4 blocks; block 3's copies point at frames 32..35 -> invalid (clamped)
    assert lay.num_blocks == 4 and lay.rc_len == 16
    np.testing.assert_array_equal(
        lay.rc_idx[:4], np.array([8, 9, 10, 11]))
    assert lay.rc_invalid[-4:].all() and not lay.rc_invalid[:-4].any()


def test_append_and_strip_roundtrip():
    lay = block_layout(16, 8, 4)
    x = jnp.arange(2 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 3)
    ext = append_right_context(x, lay)
    assert ext.shape == (2, 16 + 8, 3)
    # first rc copy of block 0 duplicates frame 8
    np.testing.assert_allclose(ext[:, 16], x[:, 8])
    np.testing.assert_allclose(strip_right_context(ext, lay), x)


def test_padding_extension_and_bias():
    lay = block_layout(16, 8, 4)
    pad = jnp.zeros((1, 16), dtype=bool).at[0, 12:].set(True)
    ext = extend_padding_mask(pad, lay)
    assert ext.shape == (1, 24)
    # copies of frames 12..15 (block 1's lookahead overlaps pad; block 1's
    # copies source 16..19 -> invalid)
    assert bool(ext[0, 16]) is False  # copy of frame 8
    assert bool(ext[0, 20]) and bool(ext[0, 23])  # block-1 copies invalid
    bias = block_attn_bias(lay, pad)
    assert bias.shape == (1, 1, 24, 24)
    b = np.asarray(bias[0, 0])
    # padded key fully masked for every query
    assert (b[:, 12] <= MASK_VALUE).all()
    # allowed, unpadded entry is exactly 0
    assert b[0, 0] == 0.0


def test_blockwise_reduces_to_causal_blocks_without_rc():
    lay = block_layout(12, 4, 0)
    assert lay.total_len == 12
    # frame 0 sees frames 0..3 (its own whole block), not frame 4
    assert lay.allowed[0, 3] and not lay.allowed[0, 4]
    # frame 11 sees everything
    assert lay.allowed[11].all()
