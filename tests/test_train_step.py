"""Train-step + sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from wav2vec_s_tpu.models import Wav2Vec2Model
from wav2vec_s_tpu.parallel import make_mesh, shard_batch
from wav2vec_s_tpu.train.optim import OptimConfig, build_optimizer
from wav2vec_s_tpu.train.recipes import make_pretrain_loss_fn
from wav2vec_s_tpu.train.step import TrainState, make_train_step
from wav2vec_s_tpu.train.lr_schedules import polynomial_decay, inverse_sqrt

from tests.test_wav2vec2_model import TINY, _rngs


import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def _make_state_and_batch(B=8, S=1600, M=4):
    model = Wav2Vec2Model(TINY, encoder_type="blockwise")
    src = jax.random.normal(jax.random.PRNGKey(1), (B, S))
    mask_pos = jnp.tile(jnp.arange(M, dtype=jnp.int32)[None], (B, 1))
    variables = model.init(_rngs(), src, mask_pos, 0, train=False)
    opt = build_optimizer(OptimConfig(clip_norm=1.0, total_updates=100,
                                      warmup_updates=10))
    state = TrainState.create(variables["params"], opt)
    batch = {"source": src, "mask_positions": mask_pos}
    return model, state, batch, opt


def test_lr_schedules_match_fairseq_semantics():
    s = polynomial_decay(0.0005, warmup_updates=5000, total_updates=400000)
    np.testing.assert_allclose(float(s(0)), 0.0)
    np.testing.assert_allclose(float(s(2500)), 0.00025)
    np.testing.assert_allclose(float(s(5000)), 0.0005)
    np.testing.assert_allclose(float(s(400000)), 0.0, atol=1e-12)
    mid = float(s(202500))
    assert 0 < mid < 0.0005

    s2 = inverse_sqrt(0.0005, warmup_updates=4000, warmup_init_lr=1e-7)
    np.testing.assert_allclose(float(s2(0)), 1e-7)
    np.testing.assert_allclose(float(s2(4000)), 0.0005, rtol=1e-5)
    np.testing.assert_allclose(float(s2(16000)), 0.0005 / 2, rtol=1e-5)


def test_train_step_runs_and_decreases_loss():
    model, state, batch, opt = _make_state_and_batch()
    loss_fn = make_pretrain_loss_fn(model, main_context=4, right_context=2)
    step = jax.jit(make_train_step(loss_fn, opt), donate_argnums=0)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(5):
        state, logs = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(logs["loss_total"]) / float(logs["sample_size"]))
    assert int(state.step) == 5
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # tiny model overfits one batch quickly


def test_grad_accumulation_matches_single_batch():
    """update_freq semantics: accumulating microbatches == one big batch."""
    model, state, batch, _ = _make_state_and_batch(B=4)
    # warmup 0 so the very first update has a nonzero lr
    opt = build_optimizer(OptimConfig(clip_norm=1.0, total_updates=100,
                                      warmup_updates=0))
    state = TrainState.create(state.params, opt)
    loss_fn = make_pretrain_loss_fn(model, main_context=4, right_context=2)

    step1 = jax.jit(make_train_step(loss_fn, opt, accum_steps=1))
    step2 = jax.jit(make_train_step(loss_fn, opt, accum_steps=2))

    rng = jax.random.PRNGKey(3)
    s1, logs1 = step1(state, batch, rng)

    # same data split into 2 microbatches; rngs differ so compare only the
    # normalized-denominator behavior via sample_size and structure
    mb = jax.tree_util.tree_map(lambda x: x.reshape((2, 2) + x.shape[1:]),
                                batch)
    s2, logs2 = step2(state, mb, rng)
    assert float(logs2["sample_size"]) == float(logs1["sample_size"])
    # params updated in both
    d1 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                               s1.params, state.params))
    d2 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                               s2.params, state.params))
    assert max(d1) > 0 and max(d2) > 0


def test_skip_nonfinite_keeps_params():
    model, state, batch, opt = _make_state_and_batch(B=2)
    loss_fn = make_pretrain_loss_fn(model, main_context=4, right_context=2)
    step = jax.jit(make_train_step(loss_fn, opt))
    bad = dict(batch, source=batch["source"].at[0, 0].set(jnp.nan))
    new_state, logs = step(state, bad, jax.random.PRNGKey(0))
    assert float(logs["skipped"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_parallel_sharded_step():
    """The same step over an 8-device data mesh: batch sharded, params
    replicated, outputs identical to single-device execution."""
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    model, state, batch, opt = _make_state_and_batch(B=8)
    loss_fn = make_pretrain_loss_fn(model, main_context=4, right_context=2)
    step = jax.jit(make_train_step(loss_fn, opt))

    rng = jax.random.PRNGKey(0)
    host_state, host_logs = step(state, batch, rng)

    sharded_batch = shard_batch(mesh, batch)
    dev_state, dev_logs = step(state, sharded_batch, rng)
    np.testing.assert_allclose(float(dev_logs["loss_total"]),
                               float(host_logs["loss_total"]), rtol=1e-4)
    # parameters agree across the two execution layouts
    for a, b in zip(jax.tree_util.tree_leaves(dev_state.params),
                    jax.tree_util.tree_leaves(host_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tensor_parallel_matches_replicated():
    """DP(4) x TP(2): megatron-sharded params produce the same update."""
    from wav2vec_s_tpu.parallel import make_mesh as _mk, shard_params
    mesh = _mk(n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    model, state, batch, opt = _make_state_and_batch(B=8)
    loss_fn = make_pretrain_loss_fn(model, main_context=4, right_context=2)
    step = jax.jit(make_train_step(loss_fn, opt))
    rng = jax.random.PRNGKey(0)

    ref_state, ref_logs = step(state, batch, rng)

    tp_params = shard_params(state.params, mesh)
    tp_state = TrainState.create(tp_params, opt)
    tp_batch = shard_batch(mesh, batch)
    new_state, logs = step(tp_state, tp_batch, rng)
    np.testing.assert_allclose(float(logs["loss_total"]),
                               float(ref_logs["loss_total"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_zero_sharded_optimizer_state_matches():
    """ZeRO-1: sharding adam moments over the data axis must not change the
    update, and the new state must stay sharded."""
    from wav2vec_s_tpu.parallel.sharding import shard_opt_state

    mesh = make_mesh()
    model, state, batch, opt = _make_state_and_batch(B=8)
    loss_fn = make_pretrain_loss_fn(model, main_context=4, right_context=2)
    step = jax.jit(make_train_step(loss_fn, opt))
    rng = jax.random.PRNGKey(0)

    ref_state, _ = step(state, batch, rng)

    zstate = TrainState.create(state.params, opt)
    zstate = zstate.replace(opt_state=shard_opt_state(zstate.opt_state, mesh))
    new_state, _ = step(zstate, shard_batch(mesh, batch), rng)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # at least one moment leaf is actually sharded across devices
    sharded = [
        l for l in jax.tree_util.tree_leaves(new_state.opt_state)
        if hasattr(l, "sharding") and not l.sharding.is_fully_replicated
        and l.ndim >= 1
    ]
    assert sharded, "no optimizer-state leaf ended up sharded"


def test_context_sampling_matches_reference_distribution():
    """The (mc, rc) bucket draw must follow the reference's joint
    distribution (wav2vec_S.py:392-395: mc = randint(4,16)*2,
    rc = min(randint(2,8)*2, mc // 2)) pushed through nearest-bucket
    snapping — not a uniform choice over buckets."""
    import random as _random
    from collections import Counter

    from wav2vec_s_tpu.train.recipes import (
        DEFAULT_CONTEXT_BUCKETS, sample_context_bucket)

    buckets = DEFAULT_CONTEXT_BUCKETS

    # exact expected frequencies: enumerate the 13 x 7 grid
    exact = Counter()
    for a in range(4, 17):
        for b in range(2, 9):
            mc, rc = a * 2, min(b * 2, a)
            snap = min(buckets,
                       key=lambda t: abs(t[0] - mc) + abs(t[1] - rc))
            exact[snap] += 1
    total = sum(exact.values())

    rng = _random.Random(0)
    n = 20000
    got = Counter(sample_context_bucket(rng, buckets) for _ in range(n))

    assert set(got) <= set(buckets)
    for b in buckets:
        want = exact[b] / total
        have = got[b] / n
        assert abs(have - want) < 0.02, (b, have, want)
    # sanity: the distribution is NOT uniform over buckets
    freqs = sorted(got[b] / n for b in buckets)
    assert freqs[-1] > 2 * freqs[0]


def test_remat_policies_match_plain_update():
    """remat/offload policies change memory, never math: one update under
    'dots' and 'offload_dots' must equal the plain step bit-for-bit-ish."""
    import pytest

    model, state0, batch, opt = _make_state_and_batch(B=4)
    loss_fn = make_pretrain_loss_fn(model, main_context=4, right_context=2)
    rng = jax.random.PRNGKey(3)

    def run(policy):
        step = jax.jit(make_train_step(loss_fn, opt, remat_policy=policy))
        st, logs = step(state0, batch, rng)
        return float(logs["loss_total"]), st

    base_loss, base_state = run("none")
    for policy in ("dots", "offload_dots"):
        try:
            loss, st = run(policy)
        except Exception as e:              # pragma: no cover
            if policy == "offload_dots":
                pytest.skip(f"host offload unsupported on this backend: {e}")
            raise
        np.testing.assert_allclose(loss, base_loss, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(st.params),
                        jax.tree_util.tree_leaves(base_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5)


def test_flat_optimizer_matches_tree_update():
    """The fused (raveled) optimizer path must produce the same params,
    grad norm, and skip behavior as the per-leaf tree path."""
    model, state, batch, opt = _make_state_and_batch()
    loss_fn = make_pretrain_loss_fn(model, main_context=4, right_context=2)
    rng = jax.random.PRNGKey(3)

    tree_step = jax.jit(make_train_step(loss_fn, opt, flat_optimizer=False))
    flat_step = jax.jit(make_train_step(loss_fn, opt, flat_optimizer=True))
    ts = TrainState.create(state.params, opt, flat_optimizer=False)
    fs = TrainState.create(state.params, opt, flat_optimizer=True)
    for i in range(3):
        ts, tlogs = tree_step(ts, batch, jax.random.fold_in(rng, i))
        fs, flogs = flat_step(fs, batch, jax.random.fold_in(rng, i))
    np.testing.assert_allclose(float(tlogs["grad_norm"]),
                               float(flogs["grad_norm"]), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ts.params),
            jax.tree_util.tree_leaves_with_path(fs.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7, err_msg=str(pa))
