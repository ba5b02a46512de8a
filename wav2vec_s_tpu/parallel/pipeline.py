"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference carries vestigial torchgpipe plumbing
(fairseq/fairseq/distributed/utils.py:148-239, ``--pipeline-model-parallel``)
that wav2vec-S never uses; the TPU-native equivalent is a *combinator*, not
a wrapper class: a stack of L identical layers is split across P pipeline
stages (each device holds the leading-axis shard of the STACKED layer
params), microbatches march through the stages in lockstep, and
``jax.lax.ppermute`` rotates activations over the ICI ring.  Everything is
differentiable — the backward pipeline falls out of autodiff through the
scan + ppermute, no hand-scheduled 1F1B required.

Schedule (plain GPipe, M microbatches, P stages, M + P - 1 ticks):

    tick t: stage 0 ingests microbatch t (t < M), every stage applies its
    local layer block, stage P-1 emits microbatch t-(P-1) (t >= P-1),
    activations rotate s -> s+1.

Bubble fraction is (P-1)/(M+P-1); choose M >= 4P for >80% utilization.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wav2vec_s_tpu.parallel.mesh import AXES


def stack_layer_params(layers: dict, n_layers: int | None = None) -> Any:
    """Stack ``{"layer_0": tree, "layer_1": tree, ...}`` into one tree whose
    leaves carry a leading layer axis — the layout both ``lax.scan``-over-
    layers and pipeline stage-sharding want."""
    if n_layers is None:
        n_layers = len([k for k in layers if k.startswith("layer_")])
    trees = [layers[f"layer_{i}"] for i in range(n_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def apply_stacked(layer_fn: Callable, stacked: Any, x: Any) -> Any:
    """Sequentially apply stacked layers (the non-pipelined oracle)."""
    def body(h, p):
        return layer_fn(p, h), None

    y, _ = jax.lax.scan(body, x, stacked)
    return y


def pipeline_apply(layer_fn: Callable, stacked: Any, x: jnp.ndarray,
                   mesh: Mesh, microbatches: int,
                   axis: str = AXES.pipe) -> jnp.ndarray:
    """Apply L stacked layers to ``x [B, ...]`` pipelined over ``axis``.

    ``stacked`` leaves are [L, ...]; L must divide by the pipe-axis size P
    and B by ``microbatches``.  Each stage holds L/P layers (leading-axis
    shard) and applies them with a layer scan; activations rotate stages
    via ``ppermute``.  Differentiable end to end.
    """
    from jax import shard_map

    n_pipe = mesh.shape.get(axis, 1)
    if n_pipe == 1:
        return apply_stacked(layer_fn, stacked, x)
    B = x.shape[0]
    M = microbatches
    n_data = mesh.shape.get(AXES.data, 1)
    assert B % M == 0 and (B // M) % n_data == 0, (B, M, n_data)
    L = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    assert L % n_pipe == 0, (L, n_pipe)
    xs = x.reshape(M, B // M, *x.shape[1:])

    p_spec = jax.tree_util.tree_map(
        lambda l: P(axis, *([None] * (l.ndim - 1))), stacked)

    def run(local_p, xs_local):
        idx = jax.lax.axis_index(axis)
        buf = jnp.zeros_like(xs_local[0])
        outs = jnp.zeros_like(xs_local)

        def tick(carry, t):
            buf, outs = carry
            inject = xs_local[jnp.clip(t, 0, M - 1)]
            h = jnp.where(idx == 0, inject, buf)
            h = apply_stacked(layer_fn, local_p, h)
            m_out = t - (n_pipe - 1)
            write = (idx == n_pipe - 1) & (m_out >= 0)
            upd = jax.lax.dynamic_update_slice_in_dim(
                outs, h[None], jnp.maximum(m_out, 0), axis=0)
            outs = jnp.where(write, upd, outs)
            buf = jax.lax.ppermute(
                h, axis, [(i, (i + 1) % n_pipe) for i in range(n_pipe)])
            return (buf, outs), None

        (buf, outs), _ = jax.lax.scan(
            tick, (buf, outs), jnp.arange(M + n_pipe - 1))
        # results live on the last stage only (zeros elsewhere): a psum
        # over the pipe ring replicates them to every stage
        return jax.lax.psum(outs, axis)

    # microbatch rows shard over the data axis (dp x pp composition);
    # params shard only their layer dim over pipe
    x_spec = P(None, AXES.data, *([None] * (x.ndim - 1)))
    out = shard_map(run, mesh=mesh, in_specs=(p_spec, x_spec),
                    out_specs=x_spec, check_vma=False)(stacked, xs)
    return out.reshape(B, *x.shape[1:])
