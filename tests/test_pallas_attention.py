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
