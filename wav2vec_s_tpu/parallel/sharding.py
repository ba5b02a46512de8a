"""Parameter sharding rules: tensor parallelism over the ``model`` axis.

The reference's megatron hooks are vestigial (SURVEY §2.7); here TP is a
first-class mesh axis.  Rules follow the standard megatron split:

- attention q/k/v and FFN ``fc1`` kernels: output-feature dim over ``model``
  (column parallel);
- attention out_proj and FFN ``fc2`` kernels: input-feature dim over
  ``model`` (row parallel — XLA inserts the psum);
- everything else (norms, biases, embeddings, conv front-end) replicated.

With these in_shardings on a jitted step, XLA's SPMD partitioner propagates
activation shardings and places the collectives — no hand-written
communication.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wav2vec_s_tpu.parallel.mesh import AXES

COL_PARALLEL = re.compile(
    r"(q_proj|k_proj|v_proj|fc1|weight_proj)\]\[.kernel.\]$")
ROW_PARALLEL = re.compile(r"(out_proj|fc2)\]\[.kernel.\]$")


def _spec_for(path_str: str, ndim: int, model_size: int,
              shapes_ok) -> P:
    if model_size <= 1 or ndim != 2:
        return P()
    if COL_PARALLEL.search(path_str) and shapes_ok(1):
        return P(None, AXES.model)
    if ROW_PARALLEL.search(path_str) and shapes_ok(0):
        return P(AXES.model, None)
    return P()


def param_shardings(params: Any, mesh: Mesh):
    """NamedSharding tree for a param pytree under ``mesh``."""
    model_size = mesh.shape.get(AXES.model, 1)

    def one(path, leaf):
        path_str = jax.tree_util.keystr(path)
        def shapes_ok(dim):
            return leaf.shape[dim] % model_size == 0
        spec = _spec_for(path_str, leaf.ndim, model_size, shapes_ok)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params: Any, mesh: Mesh):
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def fsdp_shardings(params: Any, mesh: Mesh, min_size: int = 4096):
    """FSDP-style parameter sharding over the ``data`` axis (reference:
    fairseq ``distributed/fully_sharded_data_parallel.py`` via fairscale,
    enabled with ``ddp_backend=fully_sharded``).

    Each large parameter shards one dimension across data-parallel devices;
    XLA's SPMD partitioner inserts the all-gather at use and the
    reduce-scatter on the gradient — the fairscale flatten/shard/rebuild
    machinery collapses into sharding annotations.  Composes with tensor
    parallelism: the TP dim (if any) keeps the ``model`` axis and FSDP
    takes a remaining divisible dim.  Small leaves (norms, biases) stay
    replicated — sharding them costs more in collective latency than it
    saves.
    """
    model_size = mesh.shape.get(AXES.model, 1)
    n_data = mesh.shape.get(AXES.data, 1)

    def one(path, leaf):
        if n_data <= 1 or leaf.ndim < 1 or leaf.size < min_size:
            return NamedSharding(mesh, P())
        path_str = jax.tree_util.keystr(path)

        def shapes_ok(dim):
            return leaf.shape[dim] % model_size == 0

        tp = _spec_for(path_str, leaf.ndim, model_size, shapes_ok)
        spec = list(tp) + [None] * (leaf.ndim - len(tp))
        # first dim not already taken by TP and divisible by n_data
        for d in range(leaf.ndim):
            if spec[d] is None and leaf.shape[d] % n_data == 0:
                spec[d] = AXES.data
                break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(one, params)


def zero_shardings(opt_state: Any, mesh: Mesh):
    """ZeRO-1 style sharding for optimizer state (fairscale OSS /
    ``optim/shard.py`` + FSDP-state analogue): moment tensors shard their
    leading dim over the ``data`` axis where divisible, everything else
    (scalar counts, small leaves) replicated.  Under SPMD the update runs on
    the sharded state and XLA inserts the gathers — per-device optimizer
    memory drops by the data-parallel width."""
    n_data = mesh.shape.get(AXES.data, 1)

    def one(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[0] % n_data == 0 and leaf.size >= n_data):
            return NamedSharding(mesh, P(AXES.data))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(one, opt_state)


def shard_opt_state(opt_state: Any, mesh: Mesh):
    return jax.tree_util.tree_map(jax.device_put, opt_state,
                                  zero_shardings(opt_state, mesh))
