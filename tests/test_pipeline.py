"""GPipe pipeline combinator: forward + gradient parity vs sequential.

The reference's pipeline plumbing is vestigial (SURVEY §2.7); our pipeline
is a shard_map/ppermute combinator.  These tests run it on the 8-device
virtual CPU mesh (data x model x pipe) and pin outputs AND grads to the
plain stacked-layer scan.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wav2vec_s_tpu.parallel.mesh import make_mesh
from wav2vec_s_tpu.parallel.pipeline import (apply_stacked, pipeline_apply,
                                             stack_layer_params)


def _mlp_layer(p, x):
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    return x + h @ p["w2"]


def _attn_layer(p, x):
    # [B, T, D] self-attention + FFN, pre-LN — a functional twin of the
    # encoder layer shape the real model pipelines
    def ln(z):
        m = z.mean(-1, keepdims=True)
        v = ((z - m) ** 2).mean(-1, keepdims=True)
        return (z - m) * jax.lax.rsqrt(v + 1e-5)

    h = ln(x)
    B, T, D = x.shape
    H = 2
    q = (h @ p["wq"]).reshape(B, T, H, D // H)
    k = (h @ p["wk"]).reshape(B, T, H, D // H)
    v = (h @ p["wv"]).reshape(B, T, H, D // H)
    a = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", q, k)
                       / (D // H) ** 0.5, -1)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, T, D)
    x = x + o @ p["wo"]
    return x + jnp.tanh(ln(x) @ p["w1"]) @ p["w2"]


def _stacked(rng, L, shapes):
    keys = {k: None for k in shapes}
    layers = {}
    for i in range(L):
        r = np.random.default_rng(rng + i)
        layers[f"layer_{i}"] = {
            k: jnp.asarray(r.standard_normal(s) * 0.2, jnp.float32)
            for k, s in shapes.items()}
    return stack_layer_params(layers, L)


@pytest.mark.parametrize("n_pipe,n_data,micro", [(4, 1, 8), (2, 2, 4)])
def test_pipeline_matches_sequential_mlp(n_pipe, n_data, micro):
    mesh = make_mesh(n_data=n_data, n_model=8 // (n_pipe * n_data),
                     n_pipe=n_pipe, devices=jax.devices()[:8])
    D = 16
    stacked = _stacked(0, 4, {"w1": (D, 32), "b1": (32,), "w2": (32, D)})
    x = jnp.asarray(np.random.default_rng(9).standard_normal((16, D)),
                    jnp.float32)

    want = apply_stacked(_mlp_layer, stacked, x)
    got = jax.jit(lambda p, x: pipeline_apply(_mlp_layer, p, x, mesh,
                                              micro))(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential():
    mesh = make_mesh(n_data=2, n_model=1, n_pipe=4,
                     devices=jax.devices()[:8])
    D = 8
    stacked = _stacked(3, 4, {
        "wq": (D, D), "wk": (D, D), "wv": (D, D), "wo": (D, D),
        "w1": (D, 16), "w2": (16, D)})
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 6, D)),
                    jnp.float32)
    tgt = jnp.asarray(np.random.default_rng(2).standard_normal((8, 6, D)),
                      jnp.float32)

    def loss_seq(p):
        return jnp.mean((apply_stacked(_attn_layer, p, x) - tgt) ** 2)

    def loss_pipe(p):
        return jnp.mean(
            (pipeline_apply(_attn_layer, p, x, mesh, microbatches=4)
             - tgt) ** 2)

    l0, g0 = jax.value_and_grad(loss_seq)(stacked)
    l1, g1 = jax.jit(jax.value_and_grad(loss_pipe))(stacked)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_pipeline_single_stage_passthrough():
    mesh = make_mesh(n_data=8, n_model=1, devices=jax.devices()[:8])
    D = 8
    stacked = _stacked(7, 2, {"w1": (D, 8), "b1": (8,), "w2": (8, D)})
    x = jnp.asarray(np.random.default_rng(4).standard_normal((4, D)),
                    jnp.float32)
    got = pipeline_apply(_mlp_layer, stacked, x, mesh, microbatches=2)
    want = apply_stacked(_mlp_layer, stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
