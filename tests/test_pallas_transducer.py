"""Pallas transducer alphas kernel vs the jnp row-scan implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from wav2vec_s_tpu.ops.transducer.jnp_impl import (
    _alphas, _lattice_log_probs)
from wav2vec_s_tpu.ops.transducer.pallas_kernel import pallas_alphas


@pytest.mark.parametrize("B,T,U,V", [(2, 6, 5, 7), (1, 17, 3, 5),
                                     (3, 8, 9, 11)])
def test_pallas_alphas_matches_jnp(B, T, U, V, rng):
    acts = jnp.asarray(rng.standard_normal((B, T, U, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U - 1)), jnp.int32)
    lp_blank, lp_emit = _lattice_log_probs(acts, labels, 0)
    want = np.asarray(_alphas(lp_blank, lp_emit))
    got = np.asarray(pallas_alphas(lp_blank, lp_emit, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_betas_matches_analytic(rng):
    from wav2vec_s_tpu.ops.transducer.analytic import _betas
    from wav2vec_s_tpu.ops.transducer.pallas_kernel import pallas_betas

    B, T, U, V = 3, 7, 5, 6
    acts = jnp.asarray(rng.standard_normal((B, T, U, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U - 1)), jnp.int32)
    al = jnp.asarray([T, T - 1, T - 2], jnp.int32)
    ll = jnp.asarray([U - 1, U - 2, U - 3], jnp.int32)
    lp_blank, lp_emit = _lattice_log_probs(acts, labels, 0)
    want, _, t_valid, _ = _betas(lp_blank, lp_emit, al, ll)
    got = pallas_betas(lp_blank, lp_emit, al, ll, interpret=True)
    # compare only valid cells (garbage regions differ by construction)
    w = np.asarray(want)
    g = np.asarray(got)
    for b in range(B):
        Tb, Ub = int(al[b]), int(ll[b])
        np.testing.assert_allclose(g[b, :Tb, :Ub + 1], w[b, :Tb, :Ub + 1],
                                   rtol=2e-4, atol=2e-4)
