"""Worker for the multi-process distributed test (run via subprocess).

Each process owns 2 virtual CPU devices; together they form a 4-device
global mesh.  The worker exercises the REAL multi-host path of the
framework: `process_local_rows` row sharding + `shard_batch`'s
`make_array_from_process_local_data` branch + the jitted train step under
SPMD.  Prints the resulting loss for the parent to compare against a
single-process run.
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import numpy as np
    import jax.numpy as jnp

    from tests.test_caat import W2V_TINY, CAAT_TINY, _rngs
    from wav2vec_s_tpu.models.caat import W2V2CaatModel
    from wav2vec_s_tpu.parallel import make_mesh, shard_batch
    from wav2vec_s_tpu.parallel.mesh import process_local_rows
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

    mesh = make_mesh(devices=jax.devices())         # 4 global devices
    opt = build_optimizer(OptimConfig(lr=1e-3, warmup_updates=10))
    step = jax.jit(make_train_step(
        make_caat_loss_fn(model, CAAT_TINY, 4, 2), opt))
    state = TrainState.create(variables["params"], opt)

    rows = process_local_rows(src.shape[0])         # this process's block
    with mesh:
        batch = shard_batch(mesh, {"source": src[rows],
                                   "targets": tgt[rows]})
        state, logs = step(state, batch, jax.random.PRNGKey(7))
        loss = float(logs["loss_total"])
    print(f"MPLOSS {pid} {loss:.6f}", flush=True)


def make_batch(np):
    rng = np.random.default_rng(0)
    src = (rng.standard_normal((8, 2400)) * 0.1).astype("float32")
    tgt = rng.integers(4, 30, (8, 5)).astype("int32")
    tgt[:, -1] = 2                                   # eos
    return src, tgt


if __name__ == "__main__":
    main()
