"""Incremental CAAT decode steps (stream/caat_step.py) must match the
recompute formulation ``W2V2CaatModel.decode_step`` for BOTH layer-norm
orderings — this pins the fused throughput path to the flax model so any
model change that diverges the hot path fails here."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_caat import W2V_TINY, CAAT_TINY, _rngs
from wav2vec_s_tpu.models.caat import W2V2CaatModel
from wav2vec_s_tpu.stream import caat_step


pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def _build(normalize_before: bool):
    caat = dataclasses.replace(CAAT_TINY,
                               decoder_normalize_before=normalize_before)
    model = W2V2CaatModel(W2V_TINY, caat)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 2400))
    prev = jnp.asarray([[caat.bos, 7, 9], [caat.bos, 4, 5]], jnp.int32)
    variables = model.init(_rngs(), src, prev, train=False)
    params = variables["params"]
    enc, _ = model.apply({"params": params}, src,
                         method=type(model).encode)
    return model, params, caat, enc


@pytest.mark.parametrize("normalize_before", [True, False])
def test_cached_steps_match_decode_step(normalize_before):
    model, params, caat, enc = _build(normalize_before)
    N, T, _ = enc.shape
    U_cap = 8
    rng = np.random.default_rng(0)

    # jointer caches are time-major ([T, N, D])
    jk, jv = caat_step.jointer_kv(params, caat, jnp.swapaxes(enc, 0, 1))
    lm = caat_step.lm_init(params, caat, N, U_cap)

    prefixes = np.full((N, U_cap), caat.pad, np.int32)
    prefixes[:, 0] = caat.bos
    lens = np.ones(N, np.int32)

    for step in range(5):
        visible = np.minimum(np.asarray([2 + 2 * step, 1 + 3 * step]), T)
        want = model.apply(
            {"params": params}, jnp.asarray(prefixes), jnp.asarray(lens),
            enc, jnp.arange(T)[None, :] >= visible[:, None],
            method=type(model).decode_step)
        got = caat_step.jointer_step(params, caat, lm.h_last, jk, jv,
                                     jnp.asarray(visible))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

        # advance stream 0 every step, stream 1 every other step —
        # exercises the masked (held) h_last path
        adv = np.asarray([True, step % 2 == 0])
        toks = rng.integers(4, caat.vocab_size, N).astype(np.int32)
        lm = caat_step.lm_step(params, caat, lm, jnp.asarray(toks),
                               jnp.asarray(lens), jnp.asarray(adv))
        for i in range(N):
            if adv[i]:
                prefixes[i, lens[i]] = toks[i]
                lens[i] += 1


@pytest.mark.parametrize("normalize_before", [True, False])
def test_lm_state_invariant_under_held_streams(normalize_before):
    """A held stream's h_last must be bitwise unchanged by lm_step."""
    model, params, caat, enc = _build(normalize_before)
    N = enc.shape[0]
    lm = caat_step.lm_init(params, caat, N, 8)
    h_before = np.asarray(lm.h_last)
    toks = jnp.asarray([5, 6], jnp.int32)
    lm2 = caat_step.lm_step(params, caat, lm, toks,
                            jnp.ones(N, jnp.int32),
                            jnp.asarray([False, True]))
    h_after = np.asarray(lm2.h_last)
    np.testing.assert_array_equal(h_before[0], h_after[0])
    assert not np.allclose(h_before[1], h_after[1])


@pytest.mark.parametrize("normalize_before", [True, False])
def test_lm_prefill_matches_step_chain(normalize_before):
    """lm_prefill (one whole-prefix forward) must produce the same caches
    and h_last as stepping the prefix token-by-token with lm_step."""
    model, params, caat, enc = _build(normalize_before)
    N, u_cap = 2, 8
    toks = np.asarray([[caat.bos, 7, 9, 4], [caat.bos, 4, 5, 6]], np.int32)
    lens = np.asarray([4, 4], np.int32)

    lm = caat_step.lm_init(params, caat, N, u_cap)      # consumes bos
    for j in range(1, 4):
        lm = caat_step.lm_step(params, caat, lm,
                               jnp.asarray(toks[:, j]),
                               jnp.full(N, j, jnp.int32),
                               jnp.ones(N, bool))

    pre = caat_step.lm_prefill(params, caat, jnp.asarray(toks),
                               jnp.asarray(lens), u_cap)
    np.testing.assert_allclose(np.asarray(pre.h_last),
                               np.asarray(lm.h_last), atol=3e-5, rtol=1e-4)
    for i in range(caat.decoder_layers):
        np.testing.assert_allclose(
            np.asarray(pre.k[i][:4]).astype(np.float32),
            np.asarray(lm.k[i][:4]).astype(np.float32),
            atol=3e-5, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(pre.v[i][:4]).astype(np.float32),
            np.asarray(lm.v[i][:4]).astype(np.float32),
            atol=3e-5, rtol=1e-4)

    # reorder + one cached step after prefill == stepping the reordered
    # prefixes (the beam expansion pattern)
    rows = jnp.asarray([1, 0], jnp.int32)
    re = caat_step.lm_reorder(pre, rows)
    nxt = caat_step.lm_step(params, caat, re,
                            jnp.asarray([8, 8], jnp.int32),
                            jnp.full(N, 4, jnp.int32), jnp.ones(N, bool))
    toks2 = np.concatenate([toks[::-1], [[8], [8]]], axis=1)
    want = caat_step.lm_prefill(params, caat, jnp.asarray(toks2),
                                jnp.full(N, 5, jnp.int32), u_cap)
    np.testing.assert_allclose(np.asarray(nxt.h_last),
                               np.asarray(want.h_last),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("normalize_before", [True, False])
@pytest.mark.parametrize("inter_beam", [1, 2])
def test_lm_beam_step_matches_lm_step(normalize_before, inter_beam):
    """The split prefix|suffix beam LM state (shared per-seed prefill K/V +
    slot-aligned chunk-local suffix + origin pointers) must produce the
    same ``h_last`` as full-width per-beam ``lm_step`` caches under beam
    reorders and held streams — attention is a set operation, so the cache
    split must not matter."""
    model, params, caat, _ = _build(normalize_before)
    N, B, IB, U_pre, S = 2, 3, inter_beam, 8, 6
    rng = np.random.default_rng(2)

    # per-stream seed prefixes (bos + a few tokens), different lengths
    seeds = np.full((N, IB, U_pre), caat.pad, np.int32)
    seed_lens = np.zeros((N, IB), np.int32)
    for n in range(N):
        for i in range(IB):
            L = int(rng.integers(1, 4))
            seeds[n, i, 0] = caat.bos
            seeds[n, i, 1:L] = rng.integers(4, caat.vocab_size, L - 1)
            seed_lens[n, i] = L

    pre = caat_step.lm_prefill(
        params, caat, jnp.asarray(seeds.reshape(N * IB, U_pre)),
        jnp.asarray(seed_lens.reshape(N * IB)), U_pre)
    origin0 = np.minimum(np.arange(B)[None, :].repeat(N, 0), IB - 1)
    beam = caat_step.lm_beam_init(pre, jnp.asarray(seed_lens.reshape(-1)),
                                  jnp.asarray(origin0.reshape(-1)),
                                  n_slots=S, beams=B)

    # reference: full-width per-beam caches via lm_reorder of the prefill
    rows0 = (np.arange(N)[:, None] * IB + origin0).reshape(-1)
    ref = caat_step.lm_reorder(pre, jnp.asarray(rows0))
    # widen the reference caches so suffix tokens fit
    ref = caat_step.LMState(
        k=tuple(jnp.pad(k, ((0, S), (0, 0), (0, 0))) for k in ref.k),
        v=tuple(jnp.pad(v, ((0, S), (0, 0), (0, 0))) for v in ref.v),
        h_last=ref.h_last)
    np.testing.assert_allclose(np.asarray(beam.h_last),
                               np.asarray(ref.h_last), atol=2e-5, rtol=1e-4)

    lens = seed_lens[np.arange(N)[:, None], origin0].reshape(-1).copy()
    for step in range(S):
        # a beam reorder permuting within each stream
        rows = np.concatenate(
            [n * B + rng.permutation(B) for n in range(N)]).astype(np.int32)
        beam = caat_step.lm_beam_reorder(beam, jnp.asarray(rows))
        ref = caat_step.lm_reorder(ref, jnp.asarray(rows))
        lens = lens[rows]
        # stream 1 freezes on odd steps (held h_last path)
        adv = np.ones((N, B), bool)
        adv[1] = step % 2 == 0
        adv = adv.reshape(-1)
        toks = rng.integers(4, caat.vocab_size, N * B).astype(np.int32)
        beam = caat_step.lm_beam_step(params, caat, beam, jnp.asarray(toks),
                                      jnp.asarray(lens), jnp.asarray(adv), B)
        ref = caat_step.lm_step(params, caat, ref, jnp.asarray(toks),
                                jnp.asarray(lens), jnp.asarray(adv))
        lens += adv.astype(np.int32)
        np.testing.assert_allclose(np.asarray(beam.h_last),
                                   np.asarray(ref.h_last), atol=3e-5,
                                   rtol=1e-4)
    assert int(beam.sptr) == S


@pytest.mark.parametrize("normalize_before", [True, False])
def test_lm_slot_step_matches_lm_step(normalize_before):
    """The slot-aligned LM state (global write pointer + validity plane)
    must produce the same ``h_last`` as the position-aligned ``lm_step``
    under an arbitrary advance pattern — attention is order-independent,
    so cache slot order must not matter."""
    model, params, caat, _ = _build(normalize_before)
    N = 2
    rng = np.random.default_rng(1)
    lm = caat_step.lm_init(params, caat, N, 16)
    slot = caat_step.lm_slot_init(params, caat, N, 16)
    np.testing.assert_allclose(np.asarray(slot.h_last),
                               np.asarray(lm.h_last), atol=1e-5)
    lens = np.ones(N, np.int32)
    for step in range(6):
        adv = np.asarray([step % 2 == 0, step % 3 != 0])
        toks = rng.integers(4, caat.vocab_size, N).astype(np.int32)
        lm = caat_step.lm_step(params, caat, lm, jnp.asarray(toks),
                               jnp.asarray(lens), jnp.asarray(adv))
        slot = caat_step.lm_slot_step(params, caat, slot,
                                      jnp.asarray(toks), jnp.asarray(lens),
                                      jnp.asarray(adv))
        lens += adv.astype(np.int32)
        np.testing.assert_allclose(np.asarray(slot.h_last),
                                   np.asarray(lm.h_last), atol=2e-5,
                                   rtol=1e-4)
    assert int(slot.ptr) == 7


@pytest.mark.parametrize("normalize_before", [True, False])
def test_lm_prefill_extend_matches_full_prefill(normalize_before):
    """Extending a prefilled cache by the emitted tokens must equal a
    from-scratch prefill over the concatenated prefix (the round-5 beam
    carry-over contract)."""
    caat = dataclasses.replace(
        CAAT_TINY, decoder_normalize_before=normalize_before)
    model = W2V2CaatModel(W2V_TINY, caat)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 2400))
    prev0 = jnp.asarray([[caat.bos, 7, 9], [caat.bos, 4, 5]], jnp.int32)
    params = model.init(_rngs(), src, prev0, train=False)["params"]
    rng = np.random.default_rng(7)
    K, U_old, S, u_cap = 3, 6, 4, 16
    old = np.full((K, U_old), caat.pad, np.int32)
    old_lens = np.asarray([3, 6, 1], np.int32)
    new_lens = np.asarray([2, 4, 0], np.int32)
    for k in range(K):
        old[k, 0] = caat.bos
        old[k, 1:old_lens[k]] = rng.integers(4, caat.vocab_size,
                                             old_lens[k] - 1)
    new = np.full((K, S), caat.pad, np.int32)
    for k in range(K):
        new[k, :new_lens[k]] = rng.integers(4, caat.vocab_size, new_lens[k])

    pre = caat_step.lm_prefill(params, caat, jnp.asarray(old),
                               jnp.asarray(old_lens), u_cap)
    ext = caat_step.lm_prefill_extend(
        params, caat, pre, jnp.asarray(old_lens), jnp.asarray(new),
        jnp.asarray(new_lens))

    # oracle: full prefill over the concatenation
    full = np.full((K, U_old + S), caat.pad, np.int32)
    lens = old_lens + new_lens
    for k in range(K):
        full[k, :old_lens[k]] = old[k, :old_lens[k]]
        full[k, old_lens[k]:lens[k]] = new[k, :new_lens[k]]
    want = caat_step.lm_prefill(params, caat, jnp.asarray(full),
                                jnp.asarray(lens), u_cap)

    np.testing.assert_allclose(np.asarray(ext.h_last),
                               np.asarray(want.h_last), atol=2e-5,
                               rtol=2e-5)
    for i in range(caat.decoder_layers):
        for k in range(K):
            L = int(lens[k])
            np.testing.assert_allclose(
                np.asarray(ext.k[i][:L, k]), np.asarray(want.k[i][:L, k]),
                atol=2e-5, rtol=2e-5, err_msg=f"k layer {i} row {k}")
            np.testing.assert_allclose(
                np.asarray(ext.v[i][:L, k]), np.asarray(want.v[i][:L, k]),
                atol=2e-5, rtol=2e-5, err_msg=f"v layer {i} row {k}")
