"""CheckpointManager policies: async commit, keep-K pruning, resume.

Reference semantics: fairseq/fairseq/checkpoint_utils.py:31-163 (keep-K,
best-K) and :427-455 (async writes via iopath — ours overlap the orbax
tensorstore write with training and commit via meta.json).
"""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from wav2vec_s_tpu.checkpoint.orbax_io import CheckpointManager


def _state(x: float):
    return {"params": {"w": jnp.full((4,), x, jnp.float32)},
            "step": jnp.asarray(int(x), jnp.int32)}


def test_async_save_commits_on_wait(tmp_path):
    mgr = CheckpointManager(tmp_path, keep_last=2, async_save=True)
    mgr.save(1, _state(1.0))
    mgr.save(2, _state(2.0))      # waits for + commits step 1
    assert 1 in mgr.all_steps()   # step 1 committed by the second save
    mgr.wait()
    assert mgr.all_steps() == [1, 2]

    mgr.save(3, _state(3.0))
    mgr.wait()
    assert mgr.all_steps() == [2, 3]          # keep_last=2 pruned step 1

    restored, meta = mgr.restore(template=_state(0.0))
    assert meta["step"] == 3
    np.testing.assert_allclose(restored["params"]["w"], 3.0)


def test_uncommitted_dir_is_invisible(tmp_path):
    mgr = CheckpointManager(tmp_path, keep_last=0, async_save=False)
    mgr.save(5, _state(5.0))
    # simulate a crash mid-async-write: step dir without the meta marker
    stale = tmp_path / "step_000000009"
    stale.mkdir()
    assert mgr.all_steps() == [5]
    assert mgr.latest_step() == 5
    restored, meta = mgr.restore(template=_state(0.0))
    assert meta["step"] == 5


def test_keep_best(tmp_path):
    mgr = CheckpointManager(tmp_path, keep_last=1, keep_best=1,
                            async_save=True)
    for step, metric in [(1, 0.5), (2, 0.1), (3, 0.9)]:
        mgr.save(step, _state(float(step)), metric=metric)
    mgr.wait()
    # keep_last=1 keeps step 3; keep_best=1 keeps step 2 (lowest metric)
    assert mgr.all_steps() == [2, 3]
    assert mgr.best_step() == 2
    meta = json.loads((tmp_path / "step_000000002" / "meta.json").read_text())
    assert meta["metric"] == pytest.approx(0.1)
