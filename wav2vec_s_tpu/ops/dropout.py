"""Dropout via the TPU hardware PRNG (Pallas).

XLA lowers ``jax.random.bernoulli`` through threefry: at pre-train shapes
the training step draws ~400M mask bits per forward (3 dropout sites x 12
layers on [B, T, 768/3072] tensors), profiled at ~14 ms/step of pure
VPU integer churn — plus the saved-mask traffic the backward reads.  This
op generates the keep mask from the on-chip PRNG (``pltpu.prng_seed`` /
``prng_random_bits``) with a per-tile deterministic reseed, so

- the forward is one read-modify-write pass at HBM bandwidth, and
- the backward REGENERATES the identical mask from the same seed instead
  of loading a saved one (custom_vjp; nothing is stored).

The RNG stream differs from the threefry path bit-for-bit — statistically
equivalent dropout, different draws.  Off-TPU (CPU tests) the wrapper
falls back to ``jax.random.bernoulli`` with the same semantics.
"""

from __future__ import annotations

import functools
import logging

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 1024         # row tile (capped per-call so in+out blocks fit VMEM)
_VMEM_BYTES_PER_BUF = 4 * 1024 * 1024   # in + out f32 blocks stay << 16 MB

logger = logging.getLogger(__name__)
_warned_fallback = False


def _rows_for(D: int, itemsize: int) -> int:
    """Row tile such that one (rows, D) buffer stays under the VMEM cap.

    At f32 with D=3072 (FFN-hidden activation dropout) the fixed 1024-row
    tile made each of the in/out VMEM blocks ~12 MB — over the 16 MB
    scoped-VMEM limit once both are resident.  Shrink rows for wide D;
    keep the 8-sublane multiple Mosaic wants.
    """
    rows = min(ROWS, max(8, _VMEM_BYTES_PER_BUF // max(1, D * itemsize)))
    return max(8, rows - rows % 8)


def _mask_kernel(x_ref, seed_ref, o_ref, *, rate, kind):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    u = pltpu.bitcast(
        jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32),
                                    jnp.uint32(8)),
        jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    keep = jnp.where(u >= rate, 1.0 / (1.0 - rate), 0.0)
    o_ref[...] = (x_ref[...].astype(jnp.float32) * keep).astype(o_ref.dtype)


def _run(x2, seed, rate):
    N, D = x2.shape
    rows = _rows_for(D, x2.dtype.itemsize)
    grid = (-(-N // rows),)
    return pl.pallas_call(
        functools.partial(_mask_kernel, rate=rate, kind=0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
    )(x2, seed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hw_dropout2(x2, seed, rate):
    return _run(x2, seed, rate)


def _hw_fwd(x2, seed, rate):
    return _run(x2, seed, rate), seed


def _hw_bwd(rate, seed, dy):
    # identical per-tile reseed -> identical mask; dx = dy * keep / (1-p)
    return _run(dy, seed, rate), np.zeros(seed.shape, jax.dtypes.float0)


_hw_dropout2.defvjp(_hw_fwd, _hw_bwd)


def hw_dropout(x, rate: float, rng, deterministic: bool = False):
    """Drop-in replacement for ``x * bernoulli(keep) / keep``.

    Uses the TPU hardware PRNG on TPU; threefry fallback elsewhere.
    """
    if rate == 0.0 or deterministic:
        return x
    if jax.default_backend() != "tpu":
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
    D = x.shape[-1]
    if D % 128 != 0:
        # hidden perf cliff: warn once so off-dim configs know they pay
        # the threefry path (ADVICE r4)
        global _warned_fallback
        if not _warned_fallback:
            _warned_fallback = True
            logger.warning(
                "hw_dropout: feature dim %d is not a multiple of 128; "
                "falling back to the (slower) threefry dropout path for "
                "this and all further off-dim sites", D)
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
    seed = jax.random.randint(rng, (1,), 0, 2 ** 31 - 1, dtype=jnp.int32)
    x2 = x.reshape(-1, D)
    return _hw_dropout2(x2, seed, float(rate)).reshape(x.shape)
