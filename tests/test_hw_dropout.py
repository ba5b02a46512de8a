"""ops/dropout.py — hardware-PRNG dropout (CPU fallback semantics here;
the TPU kernel path is exercised by the training benches and shares the
mask-regeneration design verified in tests/test_flash_dropout.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from wav2vec_s_tpu.ops.dropout import hw_dropout


def test_deterministic_and_rate_zero_identity():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 256))
    rng = jax.random.PRNGKey(3)
    assert hw_dropout(x, 0.0, rng) is x
    assert hw_dropout(x, 0.5, rng, deterministic=True) is x
    y1 = np.asarray(hw_dropout(x, 0.3, rng))
    y2 = np.asarray(hw_dropout(x, 0.3, rng))
    np.testing.assert_array_equal(y1, y2)


def test_mask_statistics_and_scaling():
    x = jnp.ones((512, 256))
    y = np.asarray(hw_dropout(x, 0.25, jax.random.PRNGKey(1)))
    kept = y != 0.0
    # survivors are upscaled by 1/(1-p); drop fraction ~ p
    np.testing.assert_allclose(y[kept], 1.0 / 0.75, rtol=1e-6)
    assert abs((~kept).mean() - 0.25) < 0.01
    # different rngs -> different masks
    y2 = np.asarray(hw_dropout(x, 0.25, jax.random.PRNGKey(2)))
    assert (y != y2).any()


def test_backward_uses_the_same_mask():
    x = jax.random.normal(jax.random.PRNGKey(0), (128, 256))
    rng = jax.random.PRNGKey(7)
    c = jax.random.normal(jax.random.PRNGKey(8), x.shape)

    def loss(xx):
        return jnp.sum(hw_dropout(xx, 0.4, rng) * c)

    val, g = jax.value_and_grad(loss)(x)
    # linear in x with a fixed mask: <g, x> == loss(x)
    np.testing.assert_allclose(float(jnp.sum(g * x)), float(val),
                               rtol=1e-4)
    # gradient is the masked, scaled cotangent
    y = hw_dropout(x, 0.4, rng)
    mask = np.asarray(y != 0.0)
    np.testing.assert_allclose(np.asarray(g)[~mask], 0.0)


def test_non_lane_aligned_width_falls_back():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 100))  # 100 % 128 != 0
    y = hw_dropout(x, 0.5, jax.random.PRNGKey(5))
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
