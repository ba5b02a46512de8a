import numpy as np
import jax

from wav2vec_s_tpu.utils import compute_span_mask_np, sample_span_mask
from wav2vec_s_tpu.utils.masking import num_mask_spans


def test_np_mask_coverage_and_uniformity(rng):
    B, T = 4, 200
    mask = compute_span_mask_np((B, T), None, 0.65, 10, rng)
    counts = mask.sum(axis=1)
    assert (counts == counts[0]).all()  # require_same_masks
    assert 0 < counts[0] <= T
    # roughly mask_prob coverage (overlap allowed -> can be below)
    assert counts[0] >= 0.3 * T


def test_np_mask_respects_padding(rng):
    B, T = 2, 100
    pad = np.zeros((B, T), dtype=bool)
    pad[1, 60:] = True
    mask = compute_span_mask_np((B, T), pad, 0.65, 10, rng)
    assert not mask[1, 60:].any()


def test_jax_mask_static_and_in_bounds():
    key = jax.random.PRNGKey(0)
    mask = sample_span_mask(key, (3, 120), None, 0.65, 10)
    m = np.asarray(mask)
    assert m.shape == (3, 120)
    assert m.sum() > 0
    n = num_mask_spans(120, 0.65, 10)
    assert m.sum(axis=1).max() <= n * 10


def test_jax_mask_jittable():
    f = jax.jit(lambda k: sample_span_mask(k, (2, 64), None, 0.65, 10))
    m1 = f(jax.random.PRNGKey(1))
    m2 = f(jax.random.PRNGKey(2))
    assert m1.shape == (2, 64)
    assert (np.asarray(m1) != np.asarray(m2)).any()
