"""Numpy oracle for the RNN-T and delay-transducer losses.

Plain-loop forward-backward over the (T, U) lattice, written directly from the
transducer recursions (Graves 2012) and the delay-expectation extension the
reference implements in CUDA (warp_transducer/include/detail/
gpu_rnnt_kernel.h:12-97 — alphas in log space, expected delay pushed along the
lattice in probability space).  Used only in tests, as the parity oracle for
the jnp and Pallas implementations — the same role the reference's pure-numpy
``transducer_np.py`` plays for its CUDA kernels.

Conventions (match the reference C API, include/rnnt.h:107-140):
- ``acts``: [T, U+1, V] unnormalized logits for one utterance; log-softmax is
  taken internally.
- lattice cell (t, u) = t source frames consumed, u labels emitted; the emit
  transition (t, u) -> (t, u+1) consumes ``labels[u]`` and incurs delay cost
  ``delay_values[t, u+1]``; the blank transition (t, u) -> (t+1, u) is free.
- loss_prob = -log p(labels | acts); loss_delay = E[sum of delay costs];
  total = loss_prob + delay_scale * loss_delay.

NOTE: the reference's *gradient* kernel indexes ``delay_values[mb*maxT + t]``
(gpu_rnnt_kernel.h:326) while its alpha/beta kernels use the offset
``b*maxT*maxU + t*maxU + u`` layout — an indexing inconsistency in the CUDA
code.  This oracle uses the consistent form (``delay_values[t, u+1]`` on the
emit edge), which matches finite differences of its own forward.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -float("inf")


def log_softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    s = x - m
    return s - np.log(np.sum(np.exp(s), axis=axis, keepdims=True))


def forward_alphas(logp, labels, blank=0):
    """logp: [T, U+1, V] log-probs; labels: [U]. Returns (alphas [T, U+1], ll)."""
    T, U1, _ = logp.shape
    U = len(labels) + 1
    assert U <= U1
    al = np.full((T, U), NEG_INF)
    al[0, 0] = 0.0
    for t in range(1, T):
        al[t, 0] = al[t - 1, 0] + logp[t - 1, 0, blank]
    for u in range(1, U):
        al[0, u] = al[0, u - 1] + logp[0, u - 1, labels[u - 1]]
    for t in range(1, T):
        for u in range(1, U):
            no_emit = al[t - 1, u] + logp[t - 1, u, blank]
            emit = al[t, u - 1] + logp[t, u - 1, labels[u - 1]]
            al[t, u] = np.logaddexp(no_emit, emit)
    ll = al[T - 1, U - 1] + logp[T - 1, U - 1, blank]
    return al, ll


def backward_betas(logp, labels, blank=0):
    T, U1, _ = logp.shape
    U = len(labels) + 1
    be = np.full((T, U), NEG_INF)
    be[T - 1, U - 1] = logp[T - 1, U - 1, blank]
    for t in range(T - 2, -1, -1):
        be[t, U - 1] = be[t + 1, U - 1] + logp[t, U - 1, blank]
    for u in range(U - 2, -1, -1):
        be[T - 1, u] = be[T - 1, u + 1] + logp[T - 1, u, labels[u]]
    for t in range(T - 2, -1, -1):
        for u in range(U - 2, -1, -1):
            no_emit = be[t + 1, u] + logp[t, u, blank]
            emit = be[t, u + 1] + logp[t, u, labels[u]]
            be[t, u] = np.logaddexp(no_emit, emit)
    return be


def forward_alpha_delay(logp, labels, alphas, delay_values, blank=0):
    """Expected accumulated delay conditioned on reaching each cell.

    ad[t, u] = E[sum of delay costs on the path | state (t,u)];
    E[total delay] = ad[T-1, U-1] (final blank edge adds no delay).
    """
    T = logp.shape[0]
    U = len(labels) + 1
    ad = np.zeros((T, U))
    for u in range(1, U):
        ad[0, u] = ad[0, u - 1] + delay_values[0, u]
    for t in range(1, T):
        ad[t, 0] = 0.0
        for u in range(1, U):
            p_blank = np.exp(alphas[t - 1, u] + logp[t - 1, u, blank]
                             - alphas[t, u])
            p_emit = np.exp(alphas[t, u - 1] + logp[t, u - 1, labels[u - 1]]
                            - alphas[t, u])
            ad[t, u] = (p_blank * ad[t - 1, u]
                        + p_emit * (ad[t, u - 1] + delay_values[t, u]))
    return ad, ad[T - 1, U - 1]


def transduce_single(acts, labels, delay_values=None, blank=0):
    """Returns (loss_prob, loss_delay) for one utterance."""
    logp = log_softmax(acts)
    al, ll = forward_alphas(logp, labels, blank)
    loss_delay = 0.0
    if delay_values is not None:
        _, loss_delay = forward_alpha_delay(logp, labels, al, delay_values, blank)
    return -ll, loss_delay


def transduce_batch(acts, labels, act_lens, label_lens, delay_values=None,
                    blank=0):
    """Batched oracle with per-utterance lengths.

    acts: [B, maxT, maxU, V]; labels: [B, maxU-1]; returns arrays [B]."""
    B = acts.shape[0]
    lp, ld = np.zeros(B), np.zeros(B)
    for b in range(B):
        T, U = act_lens[b], label_lens[b]
        dv = None if delay_values is None else delay_values[b, :T, :U + 1]
        lp[b], ld[b] = transduce_single(
            acts[b, :T, :U + 1], labels[b, :U], dv, blank)
    return lp, ld


def grad_numerical(acts, labels, delay_values=None, blank=0,
                   delay_scale=1.0, eps=1e-4):
    """Central finite differences of total loss w.r.t. acts (slow; tiny shapes)."""
    g = np.zeros_like(acts)
    it = np.nditer(acts, flags=["multi_index"])
    while not it.finished:
        idx = it.multi_index
        a1 = acts.copy(); a1[idx] += eps
        a2 = acts.copy(); a2[idx] -= eps
        lp1, ld1 = transduce_single(a1, labels, delay_values, blank)
        lp2, ld2 = transduce_single(a2, labels, delay_values, blank)
        g[idx] = ((lp1 + delay_scale * ld1) - (lp2 + delay_scale * ld2)) / (2 * eps)
        it.iternext()
    return g
