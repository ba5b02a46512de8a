import signal
import time

import numpy as np
import jax.numpy as jnp
import pytest

from wav2vec_s_tpu.utils.debug import NanDetector, Watchdog


def test_nan_detector_localizes():
    tree = {"enc": {"w": jnp.ones(3)}, "dec": {"b": jnp.asarray([1.0, np.nan])}}
    bad = NanDetector.check(tree, "params")
    assert len(bad) == 1 and "dec" in bad[0] and "1/2" in bad[0]
    with pytest.raises(FloatingPointError):
        NanDetector.assert_finite(tree)
    NanDetector.assert_finite({"x": jnp.ones(2)})


def test_watchdog_fires_and_pings():
    got = []
    old = signal.signal(signal.SIGUSR1, lambda s, f: got.append(s))
    try:
        wd = Watchdog(timeout=0.2)
        wd.start()
        for _ in range(3):           # heartbeats keep it quiet
            time.sleep(0.05)
            wd.ping()
        assert not wd.fired
        time.sleep(0.5)              # starve it
        assert wd.fired and got
        wd.stop()
    finally:
        signal.signal(signal.SIGUSR1, old)
