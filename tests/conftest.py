"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Mirrors the reference's strategy of simulating multi-node with multi-process on
one host (reference: fairseq/tests/distributed/utils.py:12-38) — here we use
XLA's virtual host devices instead of processes, which exercises the same
pjit/shard_map partitioning code paths that run over real ICI on TPU pods.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: the environment's TPU plugin overrides the JAX_PLATFORMS env var, so
# the config API is the reliable way to pin tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NOTE: do not enable the persistent compilation cache here — the
# environment's remote-compile service writes entries built for a different
# host CPU (cpu_aot_loader machine-feature mismatch -> potential SIGILL).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
