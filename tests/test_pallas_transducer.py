"""Pallas transducer alphas kernel vs the jnp row-scan implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from wav2vec_s_tpu.ops.transducer.jnp_impl import (
    _alphas, _lattice_log_probs)
from wav2vec_s_tpu.ops.transducer.pallas_kernel import pallas_alphas


pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


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
        # pass-through rows t >= T_b hold BLOCK-scale "-inf" garbage that
        # differs in magnitude between the two backends; the backward only
        # reads them through exp(min(. , 0)) clamps, where both behave
        # identically — pinned by test_pallas_loss_grad_matches_xla_path


def _lattice(rng, B=3, T=7, U=5, V=6):
    acts = jnp.asarray(rng.standard_normal((B, T, U, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U - 1)), jnp.int32)
    al = jnp.asarray([T - i for i in range(B)], jnp.int32)
    ll = jnp.asarray([U - 1 - i for i in range(B)], jnp.int32)
    return acts, labels, al, ll


def test_pallas_affine_rows_matches_scan(rng):
    from wav2vec_s_tpu.ops.transducer.jnp_impl import _affine_prefix
    from wav2vec_s_tpu.ops.transducer.pallas_kernel import pallas_affine_rows

    B, T, U = 2, 11, 9
    a = jnp.asarray(rng.uniform(0.1, 0.9, (B, T, U)), jnp.float32)
    pb = jnp.asarray(rng.uniform(0.0, 0.9, (B, T, U)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, T, U)), jnp.float32)

    # reference: python row loop with the associative-scan prefix
    prev = np.zeros((B, U), np.float32)
    want = []
    for t in range(T):
        b_row = np.asarray(pb[:, t]) * prev + np.asarray(c[:, t])
        prev = np.asarray(_affine_prefix(a[:, t], jnp.asarray(b_row), axis=1))
        want.append(prev)
    want = np.stack(want, axis=1)
    got = np.asarray(pallas_affine_rows(a, pb, c, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_expected_delay_matches_jnp(rng):
    from wav2vec_s_tpu.ops.transducer.jnp_impl import _expected_delay
    from wav2vec_s_tpu.ops.transducer.pallas_kernel import (
        pallas_expected_delay)

    acts, labels, al, ll = _lattice(rng)
    B, T, U, V = acts.shape
    lp_blank, lp_emit = _lattice_log_probs(acts, labels, 0)
    alphas = _alphas(lp_blank, lp_emit)
    dv = jnp.asarray(rng.uniform(0, 1, (B, T, U)), jnp.float32)
    want = np.asarray(_expected_delay(lp_blank, lp_emit, alphas, dv))
    got = np.asarray(pallas_expected_delay(lp_blank, lp_emit, alphas, dv,
                                           interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_expected_delay_bwd_matches_jnp(rng):
    from wav2vec_s_tpu.ops.transducer.analytic import (
        _betas, _beta_shifts, _expected_delay_bwd)
    from wav2vec_s_tpu.ops.transducer.pallas_kernel import (
        pallas_expected_delay_bwd)

    acts, labels, al, ll = _lattice(rng)
    B, T, U, V = acts.shape
    lp_blank, lp_emit = _lattice_log_probs(acts, labels, 0)
    dv = jnp.asarray(rng.uniform(0, 1, (B, T, U)), jnp.float32)
    betas, lp_b_eff, t_valid, emit_ok = _betas(lp_blank, lp_emit, al, ll)
    bdn, bup = _beta_shifts(betas, ll)
    want, dve_w = _expected_delay_bwd(lp_blank, lp_emit, betas, bdn, bup,
                                      dv, t_valid, emit_ok)
    got, dve_g = pallas_expected_delay_bwd(lp_blank, lp_emit, betas, bdn,
                                           bup, dv, t_valid, emit_ok,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dve_g), np.asarray(dve_w))


def test_pallas_loss_grad_matches_xla_path(rng):
    """Full delay-transducer loss + gradient: the Pallas lattice backend
    must match the XLA row-scan backend (which is FD-verified in
    test_transducer_analytic.py)."""
    import jax

    from wav2vec_s_tpu.ops.transducer import analytic
    from wav2vec_s_tpu.ops.transducer.jnp_impl import delay_cost_diag_positive

    acts, labels, al, ll = _lattice(rng, B=3, T=9, U=5, V=6)
    dv = delay_cost_diag_positive(acts.shape[:3], al, ll)

    def loss(acts):
        total, prob, delay = analytic.delay_transducer_loss_vjp(
            acts, labels, al, ll, dv, 0.7, 0, 1.0)
        return jnp.sum(total), (prob, delay)

    try:
        analytic.set_lattice_impl("xla")
        (tx, (px, dx)), gx = jax.value_and_grad(loss, has_aux=True)(acts)
        analytic.set_lattice_impl("pallas", interpret=True)
        (tp, (pp, dp)), gp = jax.value_and_grad(loss, has_aux=True)(acts)
    finally:
        analytic.set_lattice_impl("auto")
    np.testing.assert_allclose(float(tp), float(tx), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(px), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=2e-3, atol=2e-5)
