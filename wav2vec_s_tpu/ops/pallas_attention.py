"""Block-sparse flash attention for the wav2vec-S blockwise mask (Pallas).

The encoder's hot loop is self-attention under the (main, right)-context
block mask (SURVEY hot-loop #1).  Dense XLA attention materializes the
[B, H, S, S] logits in HBM and wastes ~half the FLOPs on masked tiles; this
kernel streams K/V tiles with an online softmax (flash attention) and, since
the block layout is a *compile-time constant*, the per-tile schedule is
resolved at trace time:

- fully-masked (q-tile, k-tile) pairs are skipped (not even loaded),
- fully-allowed pairs skip the bias add,
- partial pairs add a precomputed bias tile.

Padding (bucketed audio lengths) is handled by a runtime per-batch valid-key
count: columns >= kv_len are masked inside the kernel, so one compiled
kernel serves every utterance length within a bucket.

Training uses the same kernel through a ``custom_vjp``: the backward kernel
recomputes the softmax per q-tile (no [S, S] probabilities or per-row stats
ever hit HBM) and accumulates dq/dk/dv in VMEM with the same compile-time
tile skipping — the flash-attention backward specialized to the block mask.
Attention dropout is not implemented in-kernel; the encoder falls back to
dense XLA attention when training with attention_dropout > 0.
Grid: (B, H); K/V for one head fit in VMEM at streaming sequence lengths
(S <= ~2k).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


TILE = 128
NEG = -1e9


def _tile_plan(allowed: np.ndarray, s_pad: int):
    """Classify each (q_tile, k_tile): 0 skip, 1 full, 2 partial."""
    S = allowed.shape[0]
    ext = np.zeros((s_pad, s_pad), dtype=bool)
    ext[:S, :S] = allowed
    nt = s_pad // TILE
    plan = np.zeros((nt, nt), dtype=np.int8)
    for qi in range(nt):
        for ki in range(nt):
            tile = ext[qi * TILE:(qi + 1) * TILE, ki * TILE:(ki + 1) * TILE]
            if not tile.any():
                plan[qi, ki] = 0
            elif tile.all():
                plan[qi, ki] = 1
            else:
                plan[qi, ki] = 2
    bias = np.where(ext, 0.0, NEG).astype(np.float32)
    return plan, bias


def _kernel(q_ref, k_ref, v_ref, bias_ref, valid_ref, o_ref, *,
            plan, scale, s_pad):
    nt = s_pad // TILE

    for qi in range(nt):
        q = q_ref[qi * TILE:(qi + 1) * TILE, :].astype(jnp.float32) * scale
        m = jnp.full((TILE, 1), NEG, jnp.float32)
        l = jnp.zeros((TILE, 1), jnp.float32)
        acc = jnp.zeros((TILE, q.shape[-1]), jnp.float32)
        for ki in range(nt):
            kind = int(plan[qi, ki])
            if kind == 0:
                continue
            k = k_ref[ki * TILE:(ki + 1) * TILE, :].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if kind == 2:
                s = s + bias_ref[qi * TILE:(qi + 1) * TILE,
                                 ki * TILE:(ki + 1) * TILE]
            # additive key-validity row (0 valid / NEG padded), per batch
            s = s + valid_ref[ki * TILE:(ki + 1) * TILE][None, :]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            v = v_ref[ki * TILE:(ki + 1) * TILE, :].astype(jnp.float32)
            acc = acc * corr + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = m_new
        out = acc / jnp.maximum(l, 1e-20)
        o_ref[qi * TILE:(qi + 1) * TILE, :] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, valid_ref, out_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, plan, scale,
                s_pad):
    """Flash backward: per q-tile softmax recompute + tile-skipped grads.

    dk/dv accumulate across q-tiles in VMEM scratch (zeroed per grid step
    — scratch persists across the sequential TPU grid).
    """
    nt = s_pad // TILE
    dk_acc[:] = jnp.zeros_like(dk_acc)
    dv_acc[:] = jnp.zeros_like(dv_acc)

    for qi in range(nt):
        ks = [int(plan[qi, ki]) for ki in range(nt)]
        if not any(ks):
            dq_ref[qi * TILE:(qi + 1) * TILE, :] = jnp.zeros(
                (TILE, dq_ref.shape[-1]), dq_ref.dtype)
            continue
        qs = q_ref[qi * TILE:(qi + 1) * TILE, :].astype(jnp.float32) * scale
        do = do_ref[qi * TILE:(qi + 1) * TILE, :].astype(jnp.float32)
        out = out_ref[qi * TILE:(qi + 1) * TILE, :].astype(jnp.float32)
        dvec = jnp.sum(do * out, axis=-1, keepdims=True)     # [TILE, 1]

        def s_tile(ki, kind):
            k = k_ref[ki * TILE:(ki + 1) * TILE, :].astype(jnp.float32)
            s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if kind == 2:
                s = s + bias_ref[qi * TILE:(qi + 1) * TILE,
                                 ki * TILE:(ki + 1) * TILE]
            return s + valid_ref[ki * TILE:(ki + 1) * TILE][None, :], k

        # pass A: recompute the online-softmax row stats
        m = jnp.full((TILE, 1), NEG, jnp.float32)
        l = jnp.zeros((TILE, 1), jnp.float32)
        for ki in range(nt):
            if ks[ki] == 0:
                continue
            s, _ = s_tile(ki, ks[ki])
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(s - m_new),
                                                 axis=-1, keepdims=True)
            m = m_new
        inv_l = 1.0 / jnp.maximum(l, 1e-20)

        # pass B: grads
        dq = jnp.zeros((TILE, qs.shape[-1]), jnp.float32)
        for ki in range(nt):
            if ks[ki] == 0:
                continue
            s, k = s_tile(ki, ks[ki])
            p = jnp.exp(s - m) * inv_l                        # [TILE, TILE]
            v = v_ref[ki * TILE:(ki + 1) * TILE, :].astype(jnp.float32)
            dv_acc[ki * TILE:(ki + 1) * TILE, :] += jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - dvec)
            dq = dq + jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dk = ds^T . (q * scale): the scale folds in through qs
            dk_acc[ki * TILE:(ki + 1) * TILE, :] += jax.lax.dot_general(
                ds, qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dq_ref[qi * TILE:(qi + 1) * TILE, :] = (dq * scale).astype(
            dq_ref.dtype)

    dk_ref[:] = dk_acc[:].astype(dk_ref.dtype)
    dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_attn(q, k, v, valid, scale, layout_cache, interpret):
    plan, bias = layout_cache
    s_pad, dh_pad = q.shape[2], q.shape[3]
    kernel = functools.partial(_kernel, plan=plan, scale=scale, s_pad=s_pad)
    return _pallas_fwd(q, k, v, jnp.asarray(bias), valid, kernel, s_pad,
                       dh_pad, interpret)


def _pallas_fwd(q, k, v, bias_c, valid, kernel, s_pad, dh_pad, interpret):
    return pl.pallas_call(
        kernel,
        grid=(q.shape[0], q.shape[1]),
        in_specs=[
            pl.BlockSpec((None, None, s_pad, dh_pad),
                         lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, s_pad, dh_pad),
                         lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, s_pad, dh_pad),
                         lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, s_pad), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, s_pad), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, None, s_pad, dh_pad),
                               lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias_c, valid)


def _flash_attn_fwd(q, k, v, valid, scale, layout_cache, interpret):
    out = _flash_attn(q, k, v, valid, scale, layout_cache, interpret)
    return out, (q, k, v, valid, out)


def _flash_attn_bwd(scale, layout_cache, interpret, res, dout):
    q, k, v, valid, out = res
    plan, bias = layout_cache
    s_pad, dh_pad = q.shape[2], q.shape[3]
    kernel = functools.partial(_bwd_kernel, plan=plan, scale=scale,
                               s_pad=s_pad)
    spec4 = pl.BlockSpec((None, None, s_pad, dh_pad),
                         lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(q.shape[0], q.shape[1]),
        in_specs=[
            spec4, spec4, spec4,
            pl.BlockSpec((s_pad, s_pad), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, s_pad), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            spec4, spec4,
        ],
        out_specs=[spec4, spec4, spec4],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        scratch_shapes=[pltpu.VMEM((s_pad, dh_pad), jnp.float32),
                        pltpu.VMEM((s_pad, dh_pad), jnp.float32)],
        interpret=interpret,
    )(q, k, v, jnp.asarray(bias), valid, out, dout)
    return dq, dk, dv, None


_flash_attn.defvjp(_flash_attn_fwd, _flash_attn_bwd)


@functools.partial(jax.jit, static_argnames=("seq_len", "main_context",
                                              "right_context", "interpret"))
def blockwise_flash_attention(q, k, v, key_padding_mask, seq_len: int,
                              main_context: int, right_context: int,
                              interpret: bool = False):
    """q, k, v: [B, H, S, Dh] with S = total_len of
    ``block_layout(seq_len, mc, rc)`` (rc copies appended);
    key_padding_mask: [B, S] bool, True = padded key (the *extended* mask,
    rc-copy section included — padding there is not contiguous).

    Returns [B, H, S, Dh]; padded query rows hold garbage (stripped by the
    caller along with the rc copies).
    """
    from wav2vec_s_tpu.ops.block_mask import block_layout

    # Mosaic only targets TPU; interpret mode keeps the op usable in CPU
    # tests without callers having to thread the flag
    interpret = interpret or jax.default_backend() != "tpu"
    layout = block_layout(seq_len, main_context, right_context)
    B, H, S, Dh = q.shape
    assert S == layout.total_len, (S, layout.total_len)
    s_pad = -(-S // TILE) * TILE
    dh_pad = max(-(-Dh // 128) * 128, 128)
    plan, bias = _tile_plan(layout.allowed, s_pad)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - S), (0, dh_pad - Dh)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    valid = jnp.pad(jnp.where(key_padding_mask, NEG, 0.0).astype(jnp.float32),
                    ((0, 0), (0, s_pad - S)), constant_values=NEG)[:, None, :]

    # differentiable path: the custom_vjp routes the backward through the
    # tile-skipped flash backward kernel
    out = _flash_attn(qp, kp, vp, valid, Dh ** -0.5, (plan, bias),
                      interpret)
    return out[:, :, :S, :Dh]
