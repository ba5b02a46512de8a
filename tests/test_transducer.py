"""Transducer loss parity: jnp implementation vs numpy oracle + finite diffs."""

import numpy as np
import jax
import jax.numpy as jnp

from wav2vec_s_tpu.ops.transducer import (
    rnnt_loss, delay_transducer_loss,
    delay_cost_zero, delay_cost_diag_positive, delay_cost_diagonal)
from wav2vec_s_tpu.ops.transducer import reference as ref


def make_batch(rng, B=3, T=6, U=4, V=7):
    acts = rng.standard_normal((B, T, U + 1, V)).astype(np.float32) * 2
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    act_lens = np.array([T, T - 1, T - 2][:B], dtype=np.int32)
    label_lens = np.array([U, U - 1, U - 2][:B], dtype=np.int32)
    return acts, labels, act_lens, label_lens


def test_rnnt_loss_matches_oracle(rng):
    acts, labels, act_lens, label_lens = make_batch(rng)
    got = np.asarray(rnnt_loss(jnp.asarray(acts), jnp.asarray(labels),
                               jnp.asarray(act_lens), jnp.asarray(label_lens)))
    want, _ = ref.transduce_batch(acts.astype(np.float64), labels,
                                  act_lens, label_lens)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_delay_loss_matches_oracle(rng):
    acts, labels, act_lens, label_lens = make_batch(rng)
    B, T, U1, V = acts.shape
    dv = rng.random((B, T, U1)).astype(np.float32)
    total, lp, ld = delay_transducer_loss(
        jnp.asarray(acts), jnp.asarray(labels), jnp.asarray(act_lens),
        jnp.asarray(label_lens), jnp.asarray(dv), delay_scale=0.5)
    want_p, want_d = ref.transduce_batch(
        acts.astype(np.float64), labels, act_lens, label_lens, dv)
    np.testing.assert_allclose(np.asarray(lp), want_p, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(ld), want_d, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(total), want_p + 0.5 * want_d,
                               rtol=3e-4, atol=3e-4)


def test_rnnt_grad_matches_finite_differences(rng):
    T, U, V = 4, 2, 4
    acts = rng.standard_normal((1, T, U + 1, V)).astype(np.float64)
    labels = rng.integers(1, V, size=(1, U)).astype(np.int32)
    al = np.array([T], np.int32)
    ll = np.array([U], np.int32)

    f = lambda a: jnp.sum(rnnt_loss(a, jnp.asarray(labels), jnp.asarray(al),
                                    jnp.asarray(ll)))
    g = np.asarray(jax.grad(f)(jnp.asarray(acts)))[0]
    g_num = ref.grad_numerical(acts[0], labels[0], None, delay_scale=0.0,
                               eps=1e-5)
    np.testing.assert_allclose(g, g_num, rtol=2e-4, atol=2e-4)


def test_delay_grad_matches_finite_differences(rng):
    T, U, V = 4, 2, 4
    acts = rng.standard_normal((1, T, U + 1, V)).astype(np.float64)
    labels = rng.integers(1, V, size=(1, U)).astype(np.int32)
    dv = rng.random((1, T, U + 1))
    al = np.array([T], np.int32)
    ll = np.array([U], np.int32)
    scale = 0.7

    def f(a):
        total, _, _ = delay_transducer_loss(
            a, jnp.asarray(labels), jnp.asarray(al), jnp.asarray(ll),
            jnp.asarray(dv), delay_scale=scale)
        return jnp.sum(total)

    g = np.asarray(jax.grad(f)(jnp.asarray(acts)))[0]
    g_num = ref.grad_numerical(acts[0], labels[0], dv[0], delay_scale=scale,
                               eps=1e-5)
    np.testing.assert_allclose(g, g_num, rtol=2e-4, atol=2e-4)


def test_edge_cases(rng):
    # T=1: all labels must be emitted at t=0
    acts = rng.standard_normal((1, 1, 3, 5)).astype(np.float32)
    labels = np.array([[1, 2]], np.int32)
    got = np.asarray(rnnt_loss(jnp.asarray(acts), jnp.asarray(labels),
                               jnp.asarray([1]), jnp.asarray([2])))
    want, _ = ref.transduce_batch(acts.astype(np.float64), labels,
                                  np.array([1]), np.array([2]))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # zero labels: pure blank path
    got0 = np.asarray(rnnt_loss(jnp.asarray(acts[:, :, :1].repeat(4, 1)),
                                jnp.asarray(labels[:, :0]),
                                jnp.asarray([4]), jnp.asarray([0])))
    assert np.isfinite(got0).all()


def test_delay_cost_schedules():
    al = jnp.asarray([4], jnp.int32)
    ll = jnp.asarray([2], jnp.int32)
    shape = (1, 4, 3)
    dz = np.asarray(delay_cost_zero(shape, al, ll))
    np.testing.assert_allclose(dz[0, :, 0], np.arange(4) / 4.0)
    dp = np.asarray(delay_cost_diag_positive(shape, al, ll))
    # (t+1)*0.5 - (u+1) clipped at 0, / 2
    assert dp[0, 0, 0] == 0.0
    np.testing.assert_allclose(dp[0, 3, 0], (4 * 0.5 - 1) / 2.0)
    dd = np.asarray(delay_cost_diagonal(shape, al, ll))
    np.testing.assert_allclose(dd[0, 0, 1], abs(0.5 - 2) / 2.0)


def test_loss_is_jittable_and_vmappable(rng):
    acts, labels, act_lens, label_lens = make_batch(rng, B=2)
    f = jax.jit(rnnt_loss)
    a = np.asarray(f(jnp.asarray(acts[:2]), jnp.asarray(labels[:2]),
                     jnp.asarray(act_lens[:2]), jnp.asarray(label_lens[:2])))
    assert np.isfinite(a).all()
