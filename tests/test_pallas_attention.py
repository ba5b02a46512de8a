"""Block-sparse flash attention kernel vs dense reference (interpret mode
on CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wav2vec_s_tpu.ops.block_mask import (
    block_layout, block_attn_bias, MASK_VALUE)
from wav2vec_s_tpu.ops.pallas_attention import blockwise_flash_attention
from wav2vec_s_tpu.models.modules import dot_product_attention


def dense_reference(q, k, v, layout, key_pad):
    bias = jnp.where(jnp.asarray(layout.allowed), 0.0, MASK_VALUE)
    full = bias[None, None] + jnp.where(key_pad, MASK_VALUE, 0.0
                                        )[:, None, None, :]
    return dot_product_attention(q, k, v, full)


@pytest.mark.parametrize("T,mc,rc,B,H,Dh", [
    (96, 16, 8, 2, 2, 32),
    (200, 16, 8, 1, 4, 64),
    (64, 8, 0, 2, 2, 64),
])
def test_flash_matches_dense(T, mc, rc, B, H, Dh, rng):
    layout = block_layout(T, mc, rc)
    S = layout.total_len
    q = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.float32)
    # non-contiguous padding: pad some frame tail AND scattered rc copies
    key_pad = np.zeros((B, S), bool)
    if B > 1:
        key_pad[1, T - 10:T] = True
        key_pad[1, S - 3:] = True
    got = blockwise_flash_attention(q, k, v, jnp.asarray(key_pad), T, mc, rc,
                                    interpret=True)
    want = dense_reference(q, k, v, layout, jnp.asarray(key_pad))
    valid_q = ~key_pad
    for b in range(B):
        idx = np.flatnonzero(valid_q[b])
        np.testing.assert_allclose(np.asarray(got)[b][:, idx],
                                   np.asarray(want)[b][:, idx],
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("T,mc,rc,B,H,Dh", [
    (96, 16, 8, 2, 2, 32),
    (64, 8, 0, 1, 2, 64),
])
def test_flash_backward_matches_dense(T, mc, rc, B, H, Dh, rng):
    """The custom_vjp flash backward must match grads through the dense
    masked-softmax reference (training path)."""
    layout = block_layout(T, mc, rc)
    S = layout.total_len
    q = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.float32)
    key_pad = np.zeros((B, S), bool)
    if B > 1:
        key_pad[1, T - 10:T] = True
        key_pad[1, S - 3:] = True
    kp = jnp.asarray(key_pad)
    # cotangent weighting only valid (non-pad) query rows, like the encoder
    # loss (pad + rc-copy rows are stripped before the loss)
    w = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.float32)
    w = w * (~kp)[:, None, :, None]

    def loss_flash(q, k, v):
        out = blockwise_flash_attention(q, k, v, kp, T, mc, rc,
                                        interpret=True)
        return jnp.sum(out * w)

    def loss_dense(q, k, v):
        return jnp.sum(dense_reference(q, k, v, layout, kp) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=3e-5)
