"""In-kernel attention dropout for the block-sparse flash kernel.

The reference applies dropout to the attention probabilities
(fairseq/fairseq/modules/multihead_attention.py via dropout_module); our
flash kernel regenerates the keep mask per (b, h, q_tile, k_tile) from the
TPU hardware PRNG in both forward and backward (ops/pallas_attention.py).
On CPU (no TPU PRNG) the wrapper falls back to a jnp reference with the
same semantics — these tests cover the fallback's statistics everywhere
and the real kernel's fwd/bwd mask consistency when a TPU is present.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2vec_s_tpu.ops.block_mask import block_layout
from wav2vec_s_tpu.ops.pallas_attention import blockwise_flash_attention

SEQ, MC, RC = 96, 16, 8
B, H, DH = 2, 4, 64


def _qkv(dtype=jnp.float32):
    S = block_layout(SEQ, MC, RC).total_len
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    mk = lambda k: jax.random.normal(k, (B, H, S, DH), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2]), jnp.zeros((B, S), bool)


def test_dropout_mean_preserving():
    """E[dropout(p)] = p: averaged over keys, the dropped output stays
    close to the undropped one (inverted scaling by 1/(1-rate))."""
    q, k, v, pm = _qkv()
    o0 = blockwise_flash_attention(q, k, v, pm, SEQ, MC, RC)
    outs = []
    for seed in range(8):
        outs.append(blockwise_flash_attention(
            q, k, v, pm, SEQ, MC, RC, dropout_rate=0.1,
            dropout_rng=jax.random.PRNGKey(seed)))
    avg = jnp.mean(jnp.stack(outs), axis=0)
    # loose: 8 draws only; checks scaling is right (not 0.9x or 1.11x off)
    ratio = float(jnp.abs(avg).mean() / jnp.abs(o0).mean())
    assert 0.93 < ratio < 1.08, ratio


def test_dropout_deterministic_and_seeded():
    q, k, v, pm = _qkv()
    rng = jax.random.PRNGKey(7)
    o1 = blockwise_flash_attention(q, k, v, pm, SEQ, MC, RC,
                                   dropout_rate=0.2, dropout_rng=rng)
    o2 = blockwise_flash_attention(q, k, v, pm, SEQ, MC, RC,
                                   dropout_rate=0.2, dropout_rng=rng)
    o3 = blockwise_flash_attention(q, k, v, pm, SEQ, MC, RC,
                                   dropout_rate=0.2,
                                   dropout_rng=jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert float(jnp.abs(o1 - o3).max()) > 1e-3


def test_dropout_actually_drops():
    """With rate close to 1 the output collapses toward zero."""
    q, k, v, pm = _qkv()
    o = blockwise_flash_attention(q, k, v, pm, SEQ, MC, RC,
                                  dropout_rate=0.97,
                                  dropout_rng=jax.random.PRNGKey(3))
    o0 = blockwise_flash_attention(q, k, v, pm, SEQ, MC, RC)
    # a visible fraction of rows loses ALL keys (p_all = 0.97^n_keys);
    # surviving entries are upscaled 33x, so the max blows up vs baseline
    zero_frac = float(jnp.mean(jnp.all(jnp.abs(o) < 1e-6, axis=-1)))
    assert zero_frac > 0.05, zero_frac
    assert float(jnp.abs(o).max()) > 3 * float(jnp.abs(o0).max())


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-kernel checks need the TPU PRNG")
def test_dropout_bwd_mask_matches_fwd():
    """Backward keep-mask consistency through the REAL kernel.

    Finite differences are useless here (TPU matmuls run at bf16 input
    precision by default, and the fd signal drowns in that noise), so use
    exact structural identities instead:

    - out is LINEAR in v with the mask fixed: <dL/dv, v> == L for
      L = <out, c>.  dv is computed by the backward kernel from its
      regenerated mask, L by the forward from its drawn mask — the
      identity holds only if the two masks agree (a mask mismatch
      perturbs p_tilde entries by O(1), i.e. ~rate-sized relative error).
    - bilinearity of s = scale * q k^T: <dq, q> == <dk, k> for any
      upstream ds — pins dq/dk to the same ds tensor.
    """
    q, k, v, pm = _qkv()
    rng = jax.random.PRNGKey(11)
    c = jax.random.normal(jax.random.PRNGKey(14), v.shape)

    def loss(q_, k_, v_):
        o = blockwise_flash_attention(q_, k_, v_, pm, SEQ, MC, RC,
                                      dropout_rate=0.3, dropout_rng=rng)
        return jnp.sum(o * c)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq, dk, dv = grads
    # the inner products cancel heavily, so scale tolerances by the GROSS
    # magnitude (sum |terms|): a mask mismatch perturbs p_tilde entries by
    # O(1) -> gross-relative error ~rate (0.3); numerics sit at ~1e-4
    gross_v = float(jnp.sum(jnp.abs(dv * v)))
    assert abs(float(jnp.sum(dv * v)) - float(val)) < 2e-3 * gross_v
    gross_q = float(jnp.sum(jnp.abs(dq * q)))
    assert abs(float(jnp.sum(dq * q)) - float(jnp.sum(dk * k))) \
        < 2e-3 * gross_q


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-kernel checks need the TPU PRNG")
def test_rate0_grads_match_dense_on_tpu():
    """At rate 0 the dropout kernel must reduce exactly to the plain flash
    backward, which is pinned against dense XLA grads (CPU interpret test
    covers the math; this covers the Mosaic lowering)."""
    q, k, v, pm = _qkv()
    c = jax.random.normal(jax.random.PRNGKey(14), v.shape)

    def loss(rate, q_, k_, v_):
        o = blockwise_flash_attention(
            q_, k_, v_, pm, SEQ, MC, RC, dropout_rate=rate,
            dropout_rng=jax.random.PRNGKey(0) if rate else None)
        return jnp.sum(o * c)

    g_plain = jax.grad(loss, argnums=(1, 2, 3))(0.0, q, k, v)
    from wav2vec_s_tpu.ops.block_mask import block_layout, MASK_VALUE
    layout = block_layout(SEQ, MC, RC)
    bias = jnp.asarray(np.where(layout.allowed, 0.0, MASK_VALUE),
                       jnp.float32)[None, None]

    def dense_loss(q_, k_, v_):
        s = jnp.einsum("bhqd,bhkd->bhqk", q_, k_,
                       preferred_element_type=jnp.float32) * (DH ** -0.5)
        p = jax.nn.softmax(s + bias, -1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v_) * c)

    g_dense = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_plain, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-2)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-kernel checks need the TPU PRNG")
def test_dropout_masks_differ_across_batch():
    """Regression for the int32 seed-fold overflow (ADVICE r4): the old
    ``b * 4096 + h`` batch/head fold multiplied by 2^20 made the batch
    term b * 2^32 == 0 in int32, so every batch element drew the SAME
    keep mask.  Feed identical q/k/v rows in every batch slot: with
    per-batch masks the dropped outputs must differ across slots."""
    q, k, v, pm = _qkv()
    # make all batch rows identical so only the mask can differ
    tile = lambda t: jnp.broadcast_to(t[:1], t.shape)
    o = blockwise_flash_attention(tile(q), tile(k), tile(v), pm, SEQ, MC,
                                  RC, dropout_rate=0.3,
                                  dropout_rng=jax.random.PRNGKey(5))
    diff = float(jnp.abs(o[0] - o[1]).max())
    assert diff > 1e-3, f"batch slots drew identical dropout masks ({diff})"
