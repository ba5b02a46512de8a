"""Device mesh + sharding helpers.

Replaces the reference's distributed runtime (fairseq/fairseq/distributed/:
process-group bootstrap, NCCL/gloo collectives facade, DDP wrappers, TPU DDP
via ``xm.all_reduce`` — SURVEY §2.7) with the JAX-native equivalent: a
``jax.sharding.Mesh`` over ICI/DCN plus NamedSharding annotations.  Gradient
all-reduce, ZeRO-style state sharding and logging-stat sync all fall out of
XLA's SPMD partitioner — no hand-written communication code.

Axes:
- ``data``  — batch (DP); the reference's only real strategy (c10d/legacy DDP,
  trainer.py:749-799).
- ``model`` — optional tensor-parallel axis for the FFN/attention projections
  of large configs (the reference's megatron hooks are vestigial; here it is
  a first-class mesh axis).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    model: str = "model"
    pipe: str = "pipe"
    seq: str = "seq"


AXES = MeshAxes()


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              n_pipe: int = 1, n_seq: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model[, pipe][, seq]) mesh; defaults to all devices
    on the data axis.  The ``pipe`` / ``seq`` axes only appear when their
    size is > 1 (existing 2-axis sharding rules are unaffected otherwise).

    ``seq`` is the context-parallel axis: activations shard their TIME
    dimension over it inside the blockwise encoder (SURVEY §2.7 names
    sequence/context parallelism as the TPU build's stretch goal — the
    reference has none; long sequences there are handled only by the
    blockwise mask within one device)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_pipe * n_seq)
    assert n_data * n_model * n_pipe * n_seq == len(devices), (
        f"mesh {n_data}x{n_model}x{n_pipe}x{n_seq} != {len(devices)} devices")
    shape, names = [n_data, n_model], [AXES.data, AXES.model]
    if n_pipe > 1:
        shape.append(n_pipe)
        names.append(AXES.pipe)
    if n_seq > 1:
        shape.append(n_seq)
        names.append(AXES.seq)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P(AXES.data))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_local_rows(n_rows: int) -> slice:
    """Rows of a global batch owned by this process.

    ``make_mesh`` lays the data axis out in ``jax.devices()`` order, which
    groups devices by process — so process p owns the p-th contiguous
    row block.  Every host draws the SAME seeded batch order and collates
    only its slice (the SPMD replacement for fairseq's shard-by-rank
    iterator: one global batch, row-sharded, instead of per-rank
    batches)."""
    p, n = jax.process_index(), jax.process_count()
    per = n_rows // n
    return slice(p * per, (p + 1) * per)


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with the leading dim over ``data``.

    Multi-host (``jax.distributed.initialize`` + the same script per
    host): each process passes only its LOCAL rows — its shard of the
    ``EpochBatchIterator`` (shard-by-rank, the fairseq
    ``iterators.py`` contract) — and the global array is assembled from
    the per-process shards.  Per-rank batches must collate to the same
    shapes (the bucketed batchers guarantee this for equal
    rows-per-host; see ``train/cli.py``).
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(s, x), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
