"""Checkpoint save/restore/averaging (orbax).

Re-provides fairseq's checkpoint policies (fairseq/fairseq/
checkpoint_utils.py:31-163): last/best/every-N-updates, keep-K pruning, full
resume of optimizer + iterator state, and checkpoint averaging over the last
K checkpoints (fairseq/scripts/average_checkpoints.py — invoked by the eval
scripts before SimulEval).

The on-disk layout is an orbax PyTree checkpoint per step:
``<dir>/step_<N>/`` plus a small ``meta.json`` (best metric, iterator state).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _dir(d) -> Path:
    p = Path(d)
    p.mkdir(parents=True, exist_ok=True)
    return p


class CheckpointManager:
    def __init__(self, directory, keep_last: int = 3,
                 keep_best: int = 0, maximize_metric: bool = False,
                 async_save: bool = False):
        self.dir = _dir(directory)
        self.keep_last = keep_last
        self.keep_best = keep_best
        self.maximize = maximize_metric
        # async_save: overlap the tensorstore write with the next train
        # steps (fairseq's iopath async writes, checkpoint_utils.py:427-455).
        # meta.json doubles as the commit marker — it is written only after
        # the orbax write finishes, so an interrupted async save leaves a
        # step dir that all_steps()/restore() ignore.
        self.async_save = async_save
        self._pending: Optional[Dict[str, Any]] = None
        self._ckpt = ocp.StandardCheckpointer()

    # -- paths ----------------------------------------------------------
    def _step_dir(self, step: int) -> Path:
        return self.dir / f"step_{step:09d}"

    def all_steps(self) -> List[int]:
        return sorted(int(p.name.split("_")[1]) for p in
                      self.dir.glob("step_*")
                      if p.is_dir() and (p / "meta.json").exists())

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    # -- save / restore -------------------------------------------------
    def save(self, step: int, state, extra: Optional[Dict[str, Any]] = None,
             metric: Optional[float] = None):
        # at most one write in flight: commit the previous one first
        self.wait()
        path = self._step_dir(step)
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path.resolve() / "state", state)
        meta = {"step": step, "metric": metric, "extra": extra or {}}
        if self.async_save:
            self._pending = meta
        else:
            self._ckpt.wait_until_finished()
            (path / "meta.json").write_text(json.dumps(meta))
            self._prune()

    def wait(self):
        """Block until any in-flight async write has committed."""
        self._ckpt.wait_until_finished()
        if self._pending is not None:
            meta, self._pending = self._pending, None
            path = self._step_dir(meta["step"])
            (path / "meta.json").write_text(json.dumps(meta))
            self._prune()

    def restore(self, step: Optional[int] = None, template=None):
        self.wait()
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        path = self._step_dir(step)
        state = self._ckpt.restore(path.resolve() / "state",
                                   target=template)
        meta = json.loads((path / "meta.json").read_text())
        return state, meta

    # -- policies -------------------------------------------------------
    def _metric_of(self, step: int) -> Optional[float]:
        try:
            return json.loads(
                (self._step_dir(step) / "meta.json").read_text())["metric"]
        except Exception:
            return None

    def _prune(self):
        steps = self.all_steps()
        keep = set(steps[-self.keep_last:]) if self.keep_last else set(steps)
        if self.keep_best:
            scored = [(s, self._metric_of(s)) for s in steps]
            scored = [(s, m) for s, m in scored if m is not None]
            scored.sort(key=lambda sm: sm[1], reverse=self.maximize)
            keep |= {s for s, _ in scored[:self.keep_best]}
        for s in steps:
            if s not in keep:
                shutil.rmtree(self._step_dir(s), ignore_errors=True)

    def best_step(self) -> Optional[int]:
        scored = [(s, self._metric_of(s)) for s in self.all_steps()]
        scored = [(s, m) for s, m in scored if m is not None]
        if not scored:
            return None
        scored.sort(key=lambda sm: sm[1], reverse=self.maximize)
        return scored[0][0]


def average_params(param_trees: List[Any]) -> Any:
    """Uniform parameter averaging (scripts/average_checkpoints.py:avg)."""
    n = len(param_trees)
    assert n > 0

    def avg(*leaves):
        acc = np.zeros_like(np.asarray(leaves[0], dtype=np.float64))
        for leaf in leaves:
            acc += np.asarray(leaf, dtype=np.float64)
        return (acc / n).astype(np.asarray(leaves[0]).dtype)

    return jax.tree_util.tree_map(avg, *param_trees)


def average_last_checkpoints(directory, k: int, template=None):
    mgr = CheckpointManager(directory, keep_last=0)
    steps = mgr.all_steps()[-k:]
    trees = []
    for s in steps:
        state, _ = mgr.restore(s, template)
        params = state["params"] if isinstance(state, dict) and "params" in state else state.params
        trees.append(params)
    return average_params(trees)
