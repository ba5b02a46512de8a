"""Multi-process distributed test (SURVEY §4: the reference simulates
multi-node with multi-process on one host, fairseq
tests/distributed/utils.py:12-38).

Two real processes x 2 virtual CPU devices form a 4-device global mesh
via ``jax.distributed``; each collates only its row block and the global
batch is assembled from per-process shards
(``shard_batch`` -> ``make_array_from_process_local_data``).  The train
step's loss must match a single-process 4-device run on the same batch.
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np


import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_row_sharded_step_matches_single_process():
    worker = Path(__file__).parent / "mp_worker.py"
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    losses = []
    for out in outs:
        m = re.search(r"MPLOSS \d ([0-9.+-eE]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    assert abs(losses[0] - losses[1]) < 1e-4          # replicated loss

    # single-process reference on a 4-device mesh (same batch, same seed)
    import jax
    import jax.numpy as jnp

    from tests.mp_worker import make_batch
    from tests.test_caat import W2V_TINY, CAAT_TINY, _rngs
    from wav2vec_s_tpu.models.caat import W2V2CaatModel
    from wav2vec_s_tpu.parallel import make_mesh, shard_batch
    from wav2vec_s_tpu.train.optim import OptimConfig, build_optimizer
    from wav2vec_s_tpu.train.recipes import make_caat_loss_fn
    from wav2vec_s_tpu.train.step import TrainState, make_train_step

    src, tgt = make_batch(np)
    model = W2V2CaatModel(W2V_TINY, CAAT_TINY)
    prev = jnp.concatenate(
        [jnp.full((src.shape[0], 1), CAAT_TINY.bos, jnp.int32),
         jnp.asarray(tgt)], 1)
    variables = model.init(_rngs(), jnp.asarray(src[:2]), prev[:2],
                           train=False)
    mesh = make_mesh(devices=jax.devices()[:4])
    opt = build_optimizer(OptimConfig(lr=1e-3, warmup_updates=10))
    step = jax.jit(make_train_step(
        make_caat_loss_fn(model, CAAT_TINY, 4, 2), opt))
    state = TrainState.create(variables["params"], opt)
    with mesh:
        batch = shard_batch(mesh, {"source": src, "targets": tgt})
        _, logs = step(state, batch, jax.random.PRNGKey(7))
        want = float(logs["loss_total"])

    assert abs(losses[0] - want) < 1e-3 * max(1.0, abs(want)), (
        losses, want)
