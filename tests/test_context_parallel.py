"""Context (sequence) parallelism for the blockwise encoder.

SURVEY §2.7 lists sequence/context parallelism as the TPU build's stretch
goal — the reference has NONE (long sequences are handled only by the
blockwise attention mask within one device, wav2vec_S.py:444-489).  Here
the encoder's time axis shards over a ``seq`` mesh axis via a GSPMD
sharding constraint (Wav2Vec2Config.seq_axis): the partitioner turns the
attention einsums into all-gathers of K/V over ``seq`` plus local-query
attention, and everything elementwise stays local.  These tests pin the
sharded forward/backward to the unsharded reference on the virtual CPU
mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wav2vec_s_tpu.models import Wav2Vec2Model
from wav2vec_s_tpu.parallel import make_mesh, shard_batch
from wav2vec_s_tpu.parallel.mesh import AXES
from wav2vec_s_tpu.train.optim import OptimConfig, build_optimizer
from wav2vec_s_tpu.train.recipes import make_pretrain_loss_fn
from wav2vec_s_tpu.train.step import TrainState, make_train_step

from tests.test_wav2vec2_model import TINY, _rngs

import dataclasses


import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def test_seq_sharded_encode_matches_unsharded():
    cfg_cp = dataclasses.replace(TINY, seq_axis=AXES.seq)
    model = Wav2Vec2Model(TINY, encoder_type="blockwise")
    model_cp = Wav2Vec2Model(cfg_cp, encoder_type="blockwise")
    src = jax.random.normal(jax.random.PRNGKey(0), (2, 3200))
    mask_pos = jnp.tile(jnp.arange(2, dtype=jnp.int32)[None], (2, 1))
    variables = model.init(_rngs(), src, mask_pos, 0, train=False)

    def feats(m, v, s):
        return m.apply(v, s, None, 4, 2, False,
                       method=type(m).extract_features)[0]

    ref = jax.jit(lambda v, s: feats(model, v, s))(variables, src)

    mesh = make_mesh(n_data=2, n_model=1, n_seq=4)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda v, s: feats(model_cp, v, s))(
            variables, shard_batch(mesh, src))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=2e-5, rtol=2e-5)


def test_seq_sharded_train_step_matches_replicated():
    """DP x CP pre-train step == plain DP step (loss and params)."""
    B, S, M = 4, 1600, 4
    model = Wav2Vec2Model(TINY, encoder_type="blockwise")
    model_cp = Wav2Vec2Model(dataclasses.replace(TINY, seq_axis=AXES.seq),
                             encoder_type="blockwise")
    src = jax.random.normal(jax.random.PRNGKey(1), (B, S))
    mask_pos = jnp.tile(jnp.arange(M, dtype=jnp.int32)[None], (B, 1))
    variables = model.init(_rngs(), src, mask_pos, 0, train=False)
    opt = build_optimizer(OptimConfig(clip_norm=1.0, total_updates=100,
                                      warmup_updates=10))
    batch = {"source": src, "mask_positions": mask_pos}
    rng = jax.random.PRNGKey(7)

    def run(m, mesh=None):
        loss_fn = make_pretrain_loss_fn(m, main_context=4, right_context=2)
        step = jax.jit(make_train_step(loss_fn, opt))
        state = TrainState.create(variables["params"], opt)
        b = batch if mesh is None else shard_batch(mesh, batch)
        state, logs = step(state, b, rng)
        return float(logs["loss_total"]), state.params

    ref_loss, ref_params = run(model)
    mesh = make_mesh(n_data=2, n_model=1, n_seq=4)
    with jax.set_mesh(mesh):
        cp_loss, cp_params = run(model_cp, mesh)

    np.testing.assert_allclose(ref_loss, cp_loss, rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(ref_params)
    flat_cp = jax.tree_util.tree_leaves(cp_params)
    for a, b in zip(flat_ref, flat_cp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
