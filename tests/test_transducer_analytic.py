"""Analytic-gradient transducer loss: parity vs the autodiff path + oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from wav2vec_s_tpu.ops.transducer.analytic import (
    delay_transducer_loss_vjp, _betas)
from wav2vec_s_tpu.ops.transducer.jnp_impl import (
    delay_transducer_loss, _lattice_log_probs, _alphas, _gather_final)
from wav2vec_s_tpu.ops.transducer import reference as ref
from tests.test_transducer import make_batch


def test_forward_matches_autodiff_path(rng):
    acts, labels, al, ll_ = make_batch(rng)
    dv = rng.random(acts.shape[:3]).astype(np.float32)
    args = (jnp.asarray(acts), jnp.asarray(labels), jnp.asarray(al),
            jnp.asarray(ll_), jnp.asarray(dv))
    t1, p1, d1 = delay_transducer_loss_vjp(*args, 0.5, 0)
    t2, p2, d2 = delay_transducer_loss(*args, delay_scale=0.5, blank=0)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4,
                               atol=1e-5)


def test_betas_consistent_with_alphas(rng):
    """beta(0, 0) must equal the total log-likelihood."""
    acts, labels, al, ll_ = make_batch(rng)
    lp_blank, lp_emit = _lattice_log_probs(
        jnp.asarray(acts), jnp.asarray(labels), 0)
    alphas = _alphas(lp_blank, lp_emit)
    ll = (_gather_final(alphas, jnp.asarray(al), jnp.asarray(ll_))
          + _gather_final(lp_blank, jnp.asarray(al), jnp.asarray(ll_)))
    betas, _, _, _ = _betas(lp_blank, lp_emit, jnp.asarray(al),
                            jnp.asarray(ll_))
    np.testing.assert_allclose(np.asarray(betas[:, 0, 0]), np.asarray(ll),
                               rtol=1e-4)


def test_analytic_grad_matches_finite_differences(rng):
    T, U, V = 4, 2, 5
    acts = rng.standard_normal((1, T, U + 1, V)).astype(np.float64)
    labels = rng.integers(1, V, size=(1, U)).astype(np.int32)
    dv = rng.random((1, T, U + 1))
    al = np.array([T], np.int32)
    tl = np.array([U], np.int32)
    scale = 0.7

    def f(a):
        total, _, _ = delay_transducer_loss_vjp(
            a, jnp.asarray(labels), jnp.asarray(al), jnp.asarray(tl),
            jnp.asarray(dv), scale, 0)
        return jnp.sum(total)

    g = np.asarray(jax.grad(f)(jnp.asarray(acts)))[0]
    g_num = ref.grad_numerical(acts[0], labels[0], dv[0], delay_scale=scale,
                               eps=1e-5)
    np.testing.assert_allclose(g, g_num, rtol=3e-4, atol=3e-4)


def test_analytic_grad_matches_autodiff_batched(rng):
    """Variable lengths + batch: analytic backward == autodiff backward."""
    acts, labels, al, tl = make_batch(rng, B=3, T=6, U=4, V=7)
    dv = rng.random(acts.shape[:3]).astype(np.float32)
    args = (jnp.asarray(labels), jnp.asarray(al), jnp.asarray(tl),
            jnp.asarray(dv))

    def f_analytic(a):
        t, p, d = delay_transducer_loss_vjp(a, *args, 1.0, 0)
        return jnp.sum(t) + 0.3 * jnp.sum(d)

    def f_auto(a):
        t, p, d = delay_transducer_loss(a, *args, delay_scale=1.0, blank=0)
        return jnp.sum(t) + 0.3 * jnp.sum(d)

    a = jnp.asarray(acts)
    g1 = np.asarray(jax.grad(f_analytic)(a))
    g2 = np.asarray(jax.grad(f_auto)(a))
    np.testing.assert_allclose(g1, g2, rtol=2e-3, atol=2e-4)
    # padded cells carry no gradient
    assert (g1[1, al[1]:] == 0).all()
    assert (g1[2, :, tl[2] + 1:] == 0).all()


def test_gradient_temperature_smoothing(rng):
    """temperature=1 is exact; temperature<1 flattens the prob gradient
    while leaving the forward and the delay gradient untouched."""
    acts, labels, al, tl = make_batch(rng, B=2, T=5, U=3, V=6)
    dv = rng.random(acts.shape[:3]).astype(np.float32)
    args = (jnp.asarray(labels), jnp.asarray(al), jnp.asarray(tl),
            jnp.asarray(dv))

    def grad_at(temp, which):
        def f(a):
            t, p, d = delay_transducer_loss_vjp(a, *args, 1.0, 0, temp)
            return (jnp.sum(p) if which == "prob" else jnp.sum(d))
        return np.asarray(jax.grad(f)(jnp.asarray(acts)))

    g1 = grad_at(1.0, "prob")
    g_auto = grad_at(1.0, "prob")  # determinism sanity
    np.testing.assert_allclose(g1, g_auto)
    gs = grad_at(0.5, "prob")
    assert np.abs(gs - g1).max() > 1e-4  # smoothing changes the gradient
    # forward values identical across temperatures
    t1 = delay_transducer_loss_vjp(jnp.asarray(acts), *args, 1.0, 0, 1.0)[0]
    t2 = delay_transducer_loss_vjp(jnp.asarray(acts), *args, 1.0, 0, 0.5)[0]
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2))
    # delay gradient unaffected by temperature
    d1 = grad_at(1.0, "delay")
    d2 = grad_at(0.5, "delay")
    np.testing.assert_allclose(d1, d2, atol=1e-6)
