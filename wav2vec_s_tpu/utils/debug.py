"""Observability / failure-detection utilities.

Re-provides the reference's auxiliary subsystems (SURVEY §5):

- ``profile_trace`` — twin of ``--profile`` (torch.cuda.profiler +
  emit_nvtx, fairseq_cli/hydra_train.py:40-43): wraps a region in a
  ``jax.profiler`` trace that can be opened in TensorBoard/Perfetto.
- ``annotate`` — twin of ``torch.autograd.profiler.record_function``
  (trainer.py:754-795): named trace annotation.
- ``NanDetector`` — twin of fairseq/fairseq/nan_detector.py: localizes the
  first non-finite leaf in a pytree (params, grads, activations) by path.
- ``Watchdog`` — twin of ``DistributedTimeoutWrapper``
  (fairseq/fairseq/distributed/distributed_timeout_wrapper.py): a background
  thread that raises in the main thread (via signal) if ``ping()`` is not
  called within ``timeout`` — catches wedged device calls / collectives.
"""

from __future__ import annotations

import contextlib
import os
import signal
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np
import jax


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class NanDetector:
    """Find non-finite values in pytrees and name the offending modules."""

    @staticmethod
    def check(tree, name: str = "tree") -> List[str]:
        bad = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            arr = np.asarray(leaf)
            if arr.dtype.kind == "f" and not np.isfinite(arr).all():
                n_bad = int((~np.isfinite(arr)).sum())
                bad.append(f"{name}{jax.tree_util.keystr(path)}: "
                           f"{n_bad}/{arr.size} non-finite")
        return bad

    @staticmethod
    def assert_finite(tree, name: str = "tree"):
        bad = NanDetector.check(tree, name)
        if bad:
            raise FloatingPointError("; ".join(bad))


class Watchdog:
    """Signal the process if no heartbeat arrives within ``timeout`` seconds.

    Usage:
        wd = Watchdog(timeout=300); wd.start()
        for batch in data: wd.ping(); train_step(...)
        wd.stop()
    """

    def __init__(self, timeout: float, sig=signal.SIGUSR1):
        self.timeout = timeout
        self.sig = sig
        self._event = threading.Event()
        self._stopped = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.fired = False

    def _run(self):
        while not self._stopped.is_set():
            if not self._event.wait(self.timeout):
                if self._stopped.is_set():
                    return
                self.fired = True
                os.kill(os.getpid(), self.sig)
                return
            self._event.clear()

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def ping(self):
        self._event.set()

    def stop(self):
        self._stopped.set()
        self._event.set()
        if self._thread:
            self._thread.join(timeout=1)
