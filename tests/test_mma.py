"""Monotonic multihead attention baseline tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_caat import W2V_TINY, CAAT_TINY, _rngs
from wav2vec_s_tpu.models.mma import (
    expected_alignment, MMAModel, latency_loss)


def test_expected_alignment_properties(rng):
    B, H, U, S = 2, 3, 4, 8
    p = jnp.asarray(rng.uniform(0.1, 0.9, (B, H, U, S)), jnp.float32)
    pad = jnp.zeros((B, S), bool)
    alpha = np.asarray(expected_alignment(p, pad))
    assert alpha.shape == (B, H, U, S)
    assert (alpha >= -1e-6).all()
    # each step's alignment mass is a (sub-)distribution over source
    sums = alpha.sum(-1)
    assert (sums <= 1.0 + 1e-4).all()
    assert (sums > 0.01).all()
    # with p ~ 1 everywhere every step selects immediately at the previous
    # position (monotonic non-decreasing alignment)
    p1 = jnp.full((1, 1, 3, 8), 0.999)
    a1 = np.asarray(expected_alignment(p1, jnp.zeros((1, 8), bool)))
    for u in range(3):
        assert a1[0, 0, u].argmax() == 0
    # with p ~ 0 on the first frames, mass moves past them
    p2 = jnp.full((1, 1, 1, 8), 0.9).at[:, :, :, :4].set(0.001)
    a2 = np.asarray(expected_alignment(p2, jnp.zeros((1, 8), bool)))
    assert a2[0, 0, 0].argmax() == 4


def test_mma_model_forward_and_grads():
    model = MMAModel(W2V_TINY, CAAT_TINY)
    B, S, U = 2, 2400, 4
    src = jax.random.normal(jax.random.PRNGKey(0), (B, S))
    prev = jnp.asarray([[2, 5, 6, 7], [2, 8, 9, 1]], jnp.int32)
    rngs = dict(_rngs(), mono_noise=jax.random.PRNGKey(9))
    variables = model.init(rngs, src, prev, train=False)
    logits, alphas = model.apply(variables, src, prev)
    assert logits.shape == (B, U, CAAT_TINY.vocab_size)
    assert alphas.shape[0] == CAAT_TINY.decoder_layers
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(alphas)).all()

    tgt = jnp.asarray([[5, 6, 7, 2], [8, 9, 2, 1]], jnp.int32)
    src_lens = jnp.asarray([alphas.shape[-1]] * B, jnp.float32)

    def loss_fn(params):
        lg, al = model.apply({"params": params}, src, prev, train=True,
                             rngs={k: v for k, v in rngs.items()
                                   if k != "params"})
        lp = jax.nn.log_softmax(lg, -1)
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        keep = (tgt != CAAT_TINY.pad)
        lat = latency_loss(al, src_lens, ~keep)
        return jnp.sum(nll * keep) / keep.sum() + 0.1 * lat

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # monotonic energy projections receive gradient
    g = grads["layer_0"]["encoder_attn"]["mono_q_proj"]["kernel"]
    assert np.abs(np.asarray(g)).max() > 0
