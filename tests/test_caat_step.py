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

    jk, jv = caat_step.jointer_kv(params, caat, enc)
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
