"""Analytic forward-backward delay-transducer loss (custom_vjp).

Replaces the reference's fused CUDA pipeline (warp_transducer
gpu_rnnt_kernel.h: alphas/betas wavefronts + compute_grad_withdelay kernel)
with TPU-friendly row scans:

- forward: alphas + expected-delay alphas (same recursions as
  ``jnp_impl``), returning (total, prob, delay) per utterance;
- backward: betas + expected-delay betas via *reverse* row scans over a
  virtually-extended lattice (a blank pass-through row at t = T_b closes the
  final blank edge, so per-sample lengths need no special-casing inside the
  scan), then the closed-form gradients

    dP/da(t,u,v)  = occ * p_v - [v==blank] e_b - [v==y_u] e_y        (P=-ll)
    dE/da(t,u,v)  = [v==blank] e_b c0 + [v==y_u] e_y c1
                    - p_v (e_b c0 + e_y c1)                          (E=delay)

  with edge posteriors e_b = exp(a + lp_b + B(t+1,u) - ll),
  e_y = exp(a + lp_y + B(t,u+1) - ll), occupancy occ = e_b + e_y, and delay
  coefficients c0 = ad + bd(t+1,u) - E, c1 = ad + dv(t,u+1) + bd(t,u+1) - E.

NOTE: the reference gradient kernel indexes ``delay_values[mb*maxT + t]``
(gpu_rnnt_kernel.h:326), inconsistent with its own alpha/beta kernels'
``[b, t, u]`` layout; this implementation uses the consistent ``dv(t, u+1)``
on the emit edge and matches finite differences of its own forward.

``temperature`` reproduces the reference's gradient-smoothing variant
(compute_grad_withdelay_smooth_kernel); at the recipes' default 1.0 it is
the exact gradient.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from wav2vec_s_tpu.ops.transducer.jnp_impl import (
    _alphas, _expected_delay, _gather_final, _lattice_log_probs_lse,
    _prefix_logsumexp, _affine_prefix)

# "minus infinity" that survives a cumulative sum over the U axis in f32
BLOCK = -1e9

# lattice backend: "auto" currently selects the XLA row scans everywhere.
# The Pallas kernels (pallas_kernel.py — prefix-LSE alphas, flipped
# betas, affine-scan delay; the structural twin of warp_transducer's
# fused CUDA pipeline) are parity-tested and selectable with "pallas",
# but on v5e they measure within noise of the XLA scans at training
# shapes (28.3 vs 29.5 ms fwd+bwd at [16,32,65,512], BENCH r04 — the
# pad-to-128 lane waste on the U axis and the multi-pallas_call
# structure eat the fusion win), so they have not earned default status.
# ``interpret`` runs the Pallas kernels in interpreter mode (CPU tests).
_LATTICE_IMPL = "auto"
_INTERPRET = False


def set_lattice_impl(name: str, interpret: bool = False):
    global _LATTICE_IMPL, _INTERPRET
    assert name in ("auto", "xla", "pallas"), name
    _LATTICE_IMPL = name
    _INTERPRET = interpret


def _pallas_on() -> bool:
    return _LATTICE_IMPL == "pallas"


def _lattice_masks(shape, act_lens, label_lens):
    B, T, U = shape
    t_valid = jnp.arange(T)[None, :] < act_lens[:, None]             # [B,T]
    u_emit = jnp.arange(U)[None, :] < label_lens[:, None]            # [B,U]
    emit_ok = u_emit[:, None, :] & t_valid[:, :, None]               # [B,T,U]
    return t_valid, emit_ok


def _betas(lp_blank, lp_emit, act_lens, label_lens):
    """Backward scores [B, T, U] on the virtually-extended lattice."""
    B, T, U = lp_blank.shape
    t_valid, emit_ok = _lattice_masks((B, T, U), act_lens, label_lens)
    lp_e_eff = jnp.where(emit_ok, lp_emit, BLOCK)
    lp_b_eff = jnp.where(t_valid[:, :, None], lp_blank, 0.0)

    # f(u) = sum_{j<u} effective emit(t, j); blocked emits poison any path
    # crossing them (suffix-only in valid rows, everything in pass-through
    # rows, so no catastrophic cancellation on valid paths)
    f = jnp.pad(jnp.cumsum(lp_e_eff[:, :, :-1], axis=2),
                ((0, 0), (0, 0), (1, 0)))

    u_idx = jnp.arange(U)[None, :]
    beta_virtual = jnp.where(u_idx == label_lens[:, None], 0.0, BLOCK)

    def row(beta_next, xs):
        lpb_t, f_t = xs
        z = beta_next + lpb_t + f_t
        zrev = jnp.flip(_prefix_logsumexp(jnp.flip(z, axis=1), axis=1),
                        axis=1)
        return zrev - f_t, zrev - f_t

    xs = (jnp.moveaxis(lp_b_eff, 1, 0)[::-1], jnp.moveaxis(f, 1, 0)[::-1])
    _, rows = lax.scan(row, beta_virtual, xs)
    betas = jnp.moveaxis(rows[::-1], 0, 1)
    return betas, lp_b_eff, t_valid, emit_ok


def _beta_shifts(betas, label_lens):
    """B(t+1, u) (virtual row appended) and B(t, u+1)."""
    B, T, U = betas.shape
    virtual = jnp.where(jnp.arange(U)[None, None, :]
                        == label_lens[:, None, None], 0.0, BLOCK)
    beta_down = jnp.concatenate([betas[:, 1:], virtual], axis=1)
    beta_up = jnp.pad(betas[:, :, 1:], ((0, 0), (0, 0), (0, 1)),
                      constant_values=BLOCK)
    return beta_down, beta_up


def _expected_delay_bwd(lp_blank, lp_emit, betas, beta_down, beta_up,
                        delay_values, t_valid, emit_ok):
    """bd[t, u] = expected remaining delay from (t, u); reverse row scan."""
    B, T, U = betas.shape
    lp_b_eff = jnp.where(t_valid[:, :, None], lp_blank, 0.0)
    pb = jnp.exp(jnp.minimum(beta_down + lp_b_eff - betas, 0.0))
    pe_arg = jnp.where(emit_ok, beta_up + lp_emit - betas, BLOCK)
    pe = jnp.exp(jnp.minimum(pe_arg, 0.0))
    dv_edge = jnp.pad(delay_values[:, :, 1:], ((0, 0), (0, 0), (0, 1)))

    def row(bd_next, xs):
        pb_t, pe_t, dve_t = xs
        # bd(t,u) = pe*(bd(t,u+1)+dv_edge) + pb*bd_next(u), reverse in u
        a = jnp.flip(pe_t, axis=1)
        b = jnp.flip(pb_t * bd_next + pe_t * dve_t, axis=1)
        bd_t = jnp.flip(_affine_prefix(a, b, axis=1), axis=1)
        return bd_t, bd_t

    xs = (jnp.moveaxis(pb, 1, 0)[::-1], jnp.moveaxis(pe, 1, 0)[::-1],
          jnp.moveaxis(dv_edge, 1, 0)[::-1])
    _, rows = lax.scan(row, jnp.zeros((B, U)), xs)
    bd = jnp.moveaxis(rows[::-1], 0, 1)
    return bd, dv_edge


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def delay_transducer_loss_vjp(acts, labels, act_lens, label_lens,
                              delay_values, delay_scale: float = 1.0,
                              blank: int = 0, temperature: float = 1.0):
    """(total, prob, delay) per utterance — analytic-gradient version.

    ``temperature`` != 1 applies the reference's gradient smoothing
    (compute_grad_withdelay_smooth_kernel, gpu_rnnt_kernel.h:364-424): the
    probability-loss gradient's path posteriors are raised to the power
    ``temperature`` (the forward value and the delay gradient are
    unaffected).  Not a true gradient of any loss unless temperature == 1.
    """
    total, prob, delay, _ = _fwd_impl(acts, labels, act_lens, label_lens,
                                      delay_values, delay_scale, blank)
    return total, prob, delay


def _fwd_impl(acts, labels, act_lens, label_lens, delay_values,
              delay_scale, blank):
    lp_blank, lp_emit, lse = _lattice_log_probs_lse(acts, labels, blank)
    if _pallas_on():
        from wav2vec_s_tpu.ops.transducer.pallas_kernel import (
            pallas_alphas, pallas_expected_delay)
        alphas = pallas_alphas(lp_blank, lp_emit, interpret=_INTERPRET)
        ad = pallas_expected_delay(lp_blank, lp_emit, alphas, delay_values,
                                   interpret=_INTERPRET)
    else:
        alphas = _alphas(lp_blank, lp_emit)
        ad = _expected_delay(lp_blank, lp_emit, alphas, delay_values)
    ll = (_gather_final(alphas, act_lens, label_lens)
          + _gather_final(lp_blank, act_lens, label_lens))
    prob = -ll
    delay = _gather_final(ad, act_lens, label_lens)
    total = prob + delay_scale * delay
    res = (lp_blank, lp_emit, lse, alphas, ll, ad, delay)
    return total, prob, delay, res


def _vjp_fwd(acts, labels, act_lens, label_lens, delay_values,
             delay_scale, blank, temperature=1.0):
    total, prob, delay, res = _fwd_impl(acts, labels, act_lens, label_lens,
                                        delay_values, delay_scale, blank)
    saved = (acts, labels, act_lens, label_lens, delay_values) + res
    return (total, prob, delay), saved


def _vjp_bwd(delay_scale, blank, temperature, saved, cots):
    (acts, labels, act_lens, label_lens, delay_values,
     lp_blank, lp_emit, lse, alphas, ll, ad, delay) = saved
    ct, cp, cd = cots
    B, T, U, V = acts.shape

    if _pallas_on():
        from wav2vec_s_tpu.ops.transducer.pallas_kernel import (
            pallas_betas, pallas_expected_delay_bwd)
        t_valid, emit_ok = _lattice_masks(lp_blank.shape, act_lens,
                                          label_lens)
        lp_b_eff = jnp.where(t_valid[:, :, None], lp_blank, 0.0)
        betas = pallas_betas(lp_blank, lp_emit, act_lens, label_lens,
                             interpret=_INTERPRET)
        beta_down, beta_up = _beta_shifts(betas, label_lens)
        bd, dv_edge = pallas_expected_delay_bwd(
            lp_blank, lp_emit, betas, beta_down, beta_up, delay_values,
            t_valid, emit_ok, interpret=_INTERPRET)
    else:
        betas, lp_b_eff, t_valid, emit_ok = _betas(
            lp_blank, lp_emit, act_lens, label_lens)
        beta_down, beta_up = _beta_shifts(betas, label_lens)
        bd, dv_edge = _expected_delay_bwd(
            lp_blank, lp_emit, betas, beta_down, beta_up, delay_values,
            t_valid, emit_ok)

    E = delay[:, None, None]
    llb = ll[:, None, None]

    # edge posteriors (zero outside the valid lattice)
    e_b = jnp.exp(jnp.minimum(alphas + lp_b_eff + beta_down - llb, 30.0))
    e_b = jnp.where(t_valid[:, :, None], e_b, 0.0)
    e_y = jnp.exp(jnp.where(emit_ok,
                            jnp.minimum(alphas + lp_emit + beta_up - llb,
                                        30.0), BLOCK))
    occ = e_b + e_y

    bd_down = jnp.concatenate([bd[:, 1:], jnp.zeros((B, 1, U))], axis=1)
    bd_up = jnp.pad(bd[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
    c0 = ad + bd_down - E
    c1 = ad + dv_edge + bd_up - E

    w_prob = (ct + cp)[:, None, None]
    w_delay = (ct * delay_scale + cd)[:, None, None]

    # dP/da = p_v*occ - [b]e_b - [y]e_y ;  dE/da = [b]e_b c0 + [y]e_y c1
    # - p_v*(e_b c0 + e_y c1)  -> combine with opposite signs on the delay part
    if temperature != 1.0:
        # smoothing: prob-part posteriors ^ temperature (delay part exact)
        t = temperature
        occ_p, e_b_p, e_y_p = occ ** t, e_b ** t, e_y ** t
    else:
        occ_p, e_b_p, e_y_p = occ, e_b, e_y
    s_pv = w_prob * occ_p - w_delay * (e_b * c0 + e_y * c1)
    s_b = w_prob * e_b_p - w_delay * e_b * c0
    s_y = w_prob * e_y_p - w_delay * e_y * c1

    # posteriors from the saved lse: exp(a - lse) == softmax(a), but XLA
    # fuses the exp into the grad expression below instead of materializing
    # a second f32 [B,T,U,V] pass (no max/sum re-reduction either)
    probs = jnp.exp(acts.astype(jnp.float32) - lse[..., None])
    lab_onehot = jax.nn.one_hot(labels, V, dtype=probs.dtype)
    lab_onehot = jnp.pad(lab_onehot, ((0, 0), (0, 1), (0, 0)))
    blank_onehot = jax.nn.one_hot(jnp.full((1,), blank), V,
                                  dtype=probs.dtype)[0]

    cell_valid = (t_valid[:, :, None]
                  & (jnp.arange(U)[None, None, :]
                     <= label_lens[:, None, None]))
    grad = (probs * s_pv[..., None]
            - blank_onehot[None, None, None, :] * s_b[..., None]
            - lab_onehot[:, None, :, :] * s_y[..., None])
    grad = jnp.where(cell_valid[..., None], grad, 0.0)
    return (grad.astype(acts.dtype), None, None, None, None)


delay_transducer_loss_vjp.defvjp(_vjp_fwd, _vjp_bwd)
