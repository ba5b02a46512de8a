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


def _affine_prefix_lanes(a, b, u_pad):
    """Inclusive affine prefix x_u = a_u x_{u-1} + b_u along lanes.

    Hillis-Steele over the combine (a2, b2)∘(a1, b1) = (a2 a1, a2 b1 + b2)
    with identity (1, 0) rolled in at the low lanes.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    shift = 1
    while shift < u_pad:
        a_sh = jnp.where(lane < shift, 1.0, pltpu.roll(a, shift, axis=1))
        b_sh = jnp.where(lane < shift, 0.0, pltpu.roll(b, shift, axis=1))
        b = a * b_sh + b
        a = a * a_sh
        shift *= 2
    return b


def _affine_rows_kernel(a_ref, pb_ref, c_ref, x_ref, carry, *, u_pad):
    """x(t, u) = a(t, u) x(t, u-1) + pb(t, u) x(t-1, u) + c(t, u).

    Same sequential-grid/carry-row structure as ``_alphas_kernel`` — the
    Mosaic twin of the expected-delay recursions
    (warp_transducer delay_transducer.h:51-97): probability-space affine
    scans instead of log-space prefix-LSE.
    """
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    a = a_ref[:].astype(jnp.float32)
    pb = pb_ref[:].astype(jnp.float32)
    c = c_ref[:].astype(jnp.float32)
    prev = carry[0:1, :]
    for r in range(ROWS):
        b_row = pb[r:r + 1, :] * prev + c[r:r + 1, :]
        x_row = _affine_prefix_lanes(a[r:r + 1, :], b_row, u_pad)
        x_ref[r:r + 1, :] = x_row.astype(x_ref.dtype)
        prev = x_row
    carry[0:1, :] = prev


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_affine_rows(a, pb, c, interpret: bool = False):
    """Run the affine row recursion over [B, T, U] inputs (zero carry)."""
    B, T, U = a.shape
    u_pad = max(-(-U // 128) * 128, 128)
    t_pad = -(-T // ROWS) * ROWS

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, u_pad - U)))

    kernel = functools.partial(_affine_rows_kernel, u_pad=u_pad)
    out = pl.pallas_call(
        kernel,
        grid=(B, t_pad // ROWS),
        in_specs=[
            pl.BlockSpec((None, ROWS, u_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((None, ROWS, u_pad), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, u_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, u_pad), jnp.float32)],
        interpret=interpret,
    )(pad(a), pad(pb), pad(c))
    return out[:, :T, :U]


def pallas_expected_delay(lp_blank, lp_emit, alphas, delay_values,
                          interpret: bool = False):
    """``jnp_impl._expected_delay`` with the row scan in Pallas.

    The transition probabilities (pe, pb) are elementwise XLA work; only
    the sequential affine recursion runs in the kernel.
    """
    B, T, U = lp_blank.shape
    pe_arg = jnp.pad(alphas[:, :, :-1] + lp_emit[:, :, :-1],
                     ((0, 0), (0, 0), (1, 0)), constant_values=-jnp.inf)
    pe = jnp.exp(jnp.minimum(pe_arg - alphas, 0.0))
    pe = pe.at[:, :, 0].set(0.0)
    pb = jnp.zeros_like(pe)
    if T > 1:
        pb_arg = alphas[:, :-1, :] + lp_blank[:, :-1, :] - alphas[:, 1:, :]
        pb = pb.at[:, 1:, :].set(jnp.exp(jnp.minimum(pb_arg, 0.0)))

    # row 0 is a pure emission chain: a = 1 (u > 0), c = dv(0, u)
    lane_pos = (jnp.arange(U) > 0).astype(jnp.float32)[None, :]
    a = pe.at[:, 0, :].set(lane_pos)
    c = pe * delay_values
    c = c.at[:, 0, :].set(lane_pos * delay_values[:, 0, :])
    return pallas_affine_rows(a, pb, c, interpret=interpret)


def pallas_expected_delay_bwd(lp_blank, lp_emit, betas, beta_down, beta_up,
                              delay_values, t_valid, emit_ok,
                              interpret: bool = False):
    """``analytic._expected_delay_bwd`` with the reverse row scan in Pallas:
    flipping both lattice axes turns the reverse recursion into the forward
    affine-rows kernel (zero initial carry = the virtual bd row at t = T)."""
    from wav2vec_s_tpu.ops.transducer.analytic import BLOCK

    lp_b_eff = jnp.where(t_valid[:, :, None], lp_blank, 0.0)
    pb = jnp.exp(jnp.minimum(beta_down + lp_b_eff - betas, 0.0))
    pe_arg = jnp.where(emit_ok, beta_up + lp_emit - betas, BLOCK)
    pe = jnp.exp(jnp.minimum(pe_arg, 0.0))
    dv_edge = jnp.pad(delay_values[:, :, 1:], ((0, 0), (0, 0), (0, 1)))

    flip = lambda x: jnp.flip(x, axis=(1, 2))
    bd = flip(pallas_affine_rows(flip(pe), flip(pb), flip(pe * dv_edge),
                                 interpret=interpret))
    return bd, dv_edge


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


def pallas_betas(lp_blank, lp_emit, act_lens, label_lens,
                 interpret: bool = False):
    """Backward lattice scores with ``analytic._betas`` semantics, computed
    by running the alphas kernel on the time/label-flipped lattice.

    Derivation: with gamma(t', u') = beta(T-1-t', U-1-u') the beta recursion
    becomes exactly the alphas recursion with blank rows = flip(lp_b_eff)
    (the kernel's internal one-row shift supplies blank(t-1)) and emission
    edges = flip(lp_e_eff).  The first gamma row (beta at t = T-1 on the
    virtually-extended lattice) is a single emission chain from the final
    cell — injected through the kernel's row-0 convention (alpha(0, u) =
    ecum(0, u)) as lane differences, with its cell-0 value re-added outside.
    """
    from wav2vec_s_tpu.ops.transducer.analytic import BLOCK, _lattice_masks

    B, T, U = lp_blank.shape
    t_valid, emit_ok = _lattice_masks((B, T, U), act_lens, label_lens)
    lp_e_eff = jnp.where(emit_ok, lp_emit, BLOCK)
    lp_b_eff = jnp.where(t_valid[:, :, None], lp_blank, 0.0)

    u_idx = jnp.arange(U)[None, :]
    # per-sample lane roll: after flipping, a padded sample's valid lanes
    # start at U-1-U_b; roll them to lane 0 so BLOCKed emits stay in the
    # lane *suffix* (the prefix-LSE identity needs finite prefix emits)
    shift = (U - 1 - label_lens)[:, None]                      # [B, 1]

    def roll_left(x, sh):
        idx = (jnp.arange(U)[None, :] + sh) % U
        if x.ndim == 3:
            return jnp.take_along_axis(x, idx[:, None, :], axis=2)
        return jnp.take_along_axis(x, idx, axis=1)

    def roll_right(x, sh):
        idx = (jnp.arange(U)[None, :] - sh) % U
        return jnp.take_along_axis(x, idx[:, None, :], axis=2)
    # top row of the (virtually-extended) lattice: a pure emission chain
    # ending at the final cell (T_pad-1 row; pass-through blanks above T_b)
    lpb_top = jnp.take_along_axis(
        lp_b_eff[:, -1, :], label_lens[:, None], axis=1)       # [B, 1]
    # suffix sums of emit lps on the top row: sum_{j=u}^{U_b-1} emit(T-1, j)
    e_top = jnp.where(u_idx < label_lens[:, None], lp_e_eff[:, -1, :], 0.0)
    suffix = (jnp.cumsum(e_top[:, ::-1], axis=1)[:, ::-1]
              - 0.0)
    beta_top = jnp.where(u_idx <= label_lens[:, None],
                         lpb_top + suffix, 0.0)                # garbage -> 0
    gamma0 = roll_left(beta_top[:, ::-1], shift)               # flipped+rolled

    offset = gamma0[:, :1]                                     # gamma0(0)
    gamma0_c = gamma0 - offset
    row0_diff = gamma0_c[:, 1:] - gamma0_c[:, :-1]             # [B, U-1]
    emit_row0 = jnp.pad(row0_diff, ((0, 0), (0, 1)))           # col U-1 unused

    # gamma edge j -> j+1 is the beta emit edge into cell U-2-j: the flipped
    # emit lps shift by one lane (the kernel's last column is unused)
    emit_f = jnp.flip(lp_e_eff, axis=(1, 2))
    emit_rows = jnp.pad(emit_f[:, 1:, 1:], ((0, 0), (0, 0), (0, 1)),
                        constant_values=BLOCK)
    emit_rows = roll_left(emit_rows, shift)
    emit_kernel = jnp.concatenate(
        [emit_row0[:, None, :], emit_rows], axis=1)
    # gamma's blank term at row t' is lpb'(T-1-t') = flip[t']; the kernel
    # consumes input[t-1] for row t, so shift the flipped rows up by one
    blank_f = roll_left(jnp.flip(lp_b_eff, axis=(1, 2)), shift)
    blank_kernel = jnp.concatenate(
        [blank_f[:, 1:], jnp.zeros_like(blank_f[:, :1])], axis=1)

    gamma = pallas_alphas(blank_kernel, emit_kernel, interpret=interpret)
    gamma = roll_right(gamma, shift)
    return jnp.flip(gamma, axis=(1, 2)) + offset[:, None, :]
