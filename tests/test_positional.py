import numpy as np
import jax.numpy as jnp

from wav2vec_s_tpu.utils import sinusoidal_table, sinusoidal_positions_from_padding


def test_table_formula():
    dim = 8
    tab = np.asarray(sinusoidal_table(16, dim))
    half = dim // 2
    inv = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    p = 5
    np.testing.assert_allclose(tab[p, :half], np.sin(p * inv), rtol=1e-6)
    np.testing.assert_allclose(tab[p, half:], np.cos(p * inv), rtol=1e-6)
    # padding row zeroed (fairseq padding_idx=1)
    assert (tab[1] == 0).all()


def test_positions_offset_by_two_and_pad_zero():
    pad = jnp.zeros((1, 6), dtype=bool).at[0, 4:].set(True)
    emb = np.asarray(sinusoidal_positions_from_padding(pad, 8))
    tab = np.asarray(sinusoidal_table(16, 8))
    # i-th non-pad frame -> row i+2 (fairseq make_positions with padding_idx=1)
    np.testing.assert_allclose(emb[0, 0], tab[2], rtol=1e-6)
    np.testing.assert_allclose(emb[0, 3], tab[5], rtol=1e-6)
    assert (emb[0, 4] == 0).all() and (emb[0, 5] == 0).all()


def test_pad_positions_do_not_shift_following_frames():
    # positions count non-pad frames only (left-pad robustness)
    pad = jnp.zeros((1, 4), dtype=bool).at[0, 0].set(True)
    emb = np.asarray(sinusoidal_positions_from_padding(pad, 8))
    tab = np.asarray(sinusoidal_table(16, 8))
    np.testing.assert_allclose(emb[0, 1], tab[2], rtol=1e-6)
