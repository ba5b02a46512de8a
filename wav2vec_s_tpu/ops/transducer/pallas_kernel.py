"""Pallas TPU kernel for the transducer forward lattice (alphas).

The Mosaic counterpart of warp_transducer's ``compute_alphas_kernel``
(gpu_rnnt_kernel.h:12-47).  Where the CUDA kernel walks anti-diagonal
wavefronts with one thread per label and ``__syncthreads`` between
diagonals, this kernel exploits that a TPU Pallas grid executes
*sequentially*: grid = (B, T/8) rows, the running alpha row lives in VMEM
scratch across grid steps, and the in-row emission recursion is a
Hillis-Steele prefix log-sum-exp over the (lane-aligned) U axis — 7 shifted
``logaddexp`` steps instead of U sequential cells.

alphas(t, u) = ecum(t, u) + prefixLSE_k<=u[ alphas(t-1, k) + blank(t-1, k)
               - ecum(t, k) ]

Used as the optimized forward for loss evaluation; training keeps the
analytic custom_vjp (ops/transducer/analytic.py) whose backward needs betas
(round-2: same kernel pattern on reversed inputs).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8          # rows per grid step (sublane tile)
NEG = -1e30


def _prefix_lse_lanes(z, u_pad):
    """Inclusive prefix logaddexp along the last (lane) axis via rolls."""
    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    shift = 1
    while shift < u_pad:
        shifted = jnp.where(lane < shift, NEG, pltpu.roll(z, shift, axis=1))
        z = jnp.logaddexp(z, shifted)
        shift *= 2
    return z


def _alphas_kernel(lpb_ref, ecum_ref, alphas_ref, carry, *, u_pad, t_tiles):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    lpb = lpb_ref[:].astype(jnp.float32)      # [ROWS, U] blank lps, rows t-1
    ecum = ecum_ref[:].astype(jnp.float32)    # [ROWS, U] emission prefix sums

    # sequential over the 8 rows in this tile; the unrolled python loop keeps
    # everything as static vector ops
    prev = carry[0:1, :]                      # alpha(t-1, :) [1, U]
    for r in range(ROWS):
        is_first = (t_idx == 0) & (r == 0)
        ecum_r = ecum[r:r + 1, :]
        # z(k) = alpha(t-1, k) + blank(t-1, k) - ecum(t, k)
        z = prev + lpb[r:r + 1, :] - ecum_r
        alpha_r = ecum_r + _prefix_lse_lanes(z, u_pad)
        # row 0 of the lattice: pure emission chain = ecum
        alpha_r = jnp.where(is_first, ecum_r, alpha_r)
        alphas_ref[r:r + 1, :] = alpha_r.astype(alphas_ref.dtype)
        prev = alpha_r
    carry[0:1, :] = prev


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_alphas(lp_blank, lp_emit, interpret: bool = False):
    """Forward lattice scores with the same layout as ``jnp_impl._alphas``.

    lp_blank, lp_emit: [B, T, U] (U = label cells); returns alphas [B, T, U].
    """
    B, T, U = lp_blank.shape
    u_pad = max(-(-U // 128) * 128, 128)
    t_pad = -(-T // ROWS) * ROWS

    ecum = jnp.pad(jnp.cumsum(lp_emit[:, :, :-1], axis=2),
                   ((0, 0), (0, 0), (1, 0)))
    # the recursion reads blank lps of row t-1: shift down by one row
    lpb_prev = jnp.pad(lp_blank[:, :-1], ((0, 0), (1, 0), (0, 0)))

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, u_pad - U)))

    kernel = functools.partial(_alphas_kernel, u_pad=u_pad,
                               t_tiles=t_pad // ROWS)
    out = pl.pallas_call(
        kernel,
        grid=(B, t_pad // ROWS),
        in_specs=[
            pl.BlockSpec((None, ROWS, u_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ROWS, u_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, ROWS, u_pad), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, u_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, u_pad), jnp.float32)],
        interpret=interpret,
    )(pad(lpb_prev), pad(ecum))
    return out[:, :T, :U]
