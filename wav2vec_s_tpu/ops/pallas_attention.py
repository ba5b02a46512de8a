"""Block-sparse flash attention for the wav2vec-S blockwise mask (Pallas).

The encoder's hot loop is self-attention under the (main, right)-context
block mask (SURVEY hot-loop #1).  Dense XLA attention materializes the
[B, H, S, S] logits in HBM and wastes ~half the FLOPs on masked tiles; this
kernel streams K/V tiles with an online softmax (flash attention) and, since
the block layout is a *compile-time constant*, the per-tile schedule is
resolved at trace time:

- fully-masked (q_tile, k_tile) pairs are skipped (not even loaded),
- fully-allowed pairs skip the bias add,
- partial pairs add a precomputed bias tile.

Head layout: the wrapper relayouts the packed [B, S, H*Dh] activations
to per-head [B, H, s_pad, dh] blocks (grid (B, H), one head per kernel
instance) with dh kept UNPADDED — Mosaic's trailing-dim rule is
satisfied because dh is the full last array dim.  The earlier variant
additionally lane-padded dh 64 -> 128, which doubled kernel FLOPs and
HBM bytes; removing that pad was the measured win.  The relayout
transposes are still one copy per operand (see `four()` below) — the
cost that remains is the transpose, not the pad.

Padding (bucketed audio lengths) is handled by a runtime per-batch valid-key
count: columns >= kv_len are masked inside the kernel, so one compiled
kernel serves every utterance length within a bucket.

Training uses the same kernel through a ``custom_vjp``: the backward kernel
recomputes the softmax per q-tile (no [S, S] probabilities or per-row stats
ever hit HBM) and accumulates dq/dk/dv in VMEM with the same compile-time
tile skipping — the flash-attention backward specialized to the block mask.

Attention dropout runs *in-kernel* via the TPU hardware PRNG
(``pltpu.prng_seed`` / ``prng_random_bits``): each (b, head, q_tile,
k_tile) reseeds deterministically, so the backward regenerates the
identical keep mask without ever writing a [S, S] mask to HBM — the
reference materializes the full dropout mask on the attention
probabilities (multihead_attention.py's ``dropout_module``), which at
pre-train shapes is ~1.1 G random draws per step through XLA's threefry.
Dropout applies to the *normalized* probabilities
(p_tilde = softmax(s) * keep / (1-rate)), so the online-softmax
accumulators track sum(p) while the value accumulation uses p_tilde; the
softmax-jacobian row correction sum(do * out) stays valid because
sum_k g_k p_k = do . out with g = (do v^T) * keep/(1-rate).
The interpret-mode (CPU test) path has no TPU PRNG — the wrapper falls
back to a jnp reference with the same semantics there.
Grid: (B, H/hpb); K/V for one head-block fit in VMEM at streaming
sequence lengths (S <= ~2k).
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
    """Classify each (q_tile, k_tile): 0 skip, 1 full, 2 partial.

    The bias is stored COMPACT — only the partial tiles, stacked along the
    sublane axis as [n_partial*TILE, TILE] — so kernel VMEM scales with
    the number of mixed tiles (~O(nt) for the blockwise mask), not with
    S^2: the full [s_pad, s_pad] f32 buffer blew the 16 MB scoped-VMEM
    limit at 12-layer pre-train shapes.  ``slot[qi, ki]`` maps a partial
    tile to its row block in the compact array.
    """
    S = allowed.shape[0]
    ext = np.zeros((s_pad, s_pad), dtype=bool)
    ext[:S, :S] = allowed
    nt = s_pad // TILE
    plan = np.zeros((nt, nt), dtype=np.int8)
    slot = np.full((nt, nt), -1, dtype=np.int32)
    tiles = []
    for qi in range(nt):
        for ki in range(nt):
            tile = ext[qi * TILE:(qi + 1) * TILE, ki * TILE:(ki + 1) * TILE]
            if not tile.any():
                plan[qi, ki] = 0
            elif tile.all():
                plan[qi, ki] = 1
            else:
                plan[qi, ki] = 2
                slot[qi, ki] = len(tiles)
                tiles.append(np.where(tile, 0.0, NEG).astype(np.float32))
    if not tiles:
        tiles.append(np.zeros((TILE, TILE), np.float32))
    bias = np.concatenate(tiles, axis=0)        # [n_partial*TILE, TILE]
    return plan, bias, slot


def _keep_scale(seed_ref, head, qi: int, ki: int, rate: float):
    """Deterministic per-tile keep mask scaled by 1/(1-rate).

    Reseeding the hardware PRNG with (seed, bh*2^20 + qi*1024 + ki)
    makes the draw a pure function of the (b, h, q_tile, k_tile)
    coordinates, so forward and backward kernels regenerate identical
    masks with zero HBM traffic.

    The batch/head fold uses ``b * num_heads + h`` (num_heads = grid dim
    1) so the word stays in int32 for B*H < 2048: the earlier ``b * 4096
    + h`` fold made the batch term b * 2^32, which wraps to 0 in int32 —
    every batch element silently drew the SAME mask.
    """
    bh = pl.program_id(0) * pl.num_programs(1) + head
    # hardware seed takes at most 2 words: fold the coordinates into one
    pltpu.prng_seed(seed_ref[0], bh * (1 << 20) + qi * 1024 + ki)
    bits = pltpu.prng_random_bits((TILE, TILE))
    # top 24 bits -> uniform [0, 1); shift first so the sign bit is clear
    # and the int32 view is non-negative (Mosaic lacks uint32->f32 casts)
    u = pltpu.bitcast(
        jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32),
                                    jnp.uint32(8)),
        jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.where(u >= rate, 1.0 / (1.0 - rate), 0.0)


def _kernel(q_ref, k_ref, v_ref, bias_ref, valid_ref, seed_ref, o_ref,
            m_ref, l_ref, *, plan, slot, scale, s_pad, dropout_rate, dh):
    nt = s_pad // TILE
    head = pl.program_id(1)

    for qi in range(nt):
        q = q_ref[qi * TILE:(qi + 1) * TILE, :].astype(jnp.float32) * scale
        m = jnp.full((TILE, 1), NEG, jnp.float32)
        l = jnp.zeros((TILE, 1), jnp.float32)
        acc = jnp.zeros((TILE, dh), jnp.float32)
        for ki in range(nt):
            kind = int(plan[qi, ki])
            if kind == 0:
                continue
            k = k_ref[ki * TILE:(ki + 1) * TILE, :].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if kind == 2:
                sl = int(slot[qi, ki])
                s = s + bias_ref[sl * TILE:(sl + 1) * TILE, :].astype(
                    jnp.float32)
            # additive key-validity row (0 valid / NEG padded)
            s = s + valid_ref[ki * TILE:(ki + 1) * TILE][None, :]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            v = v_ref[ki * TILE:(ki + 1) * TILE, :].astype(jnp.float32)
            if dropout_rate > 0.0:
                # dropout on normalized probs: values accumulate p*keep,
                # the softmax denominator accumulates plain p
                pv = p * _keep_scale(seed_ref, head, qi, ki, dropout_rate)
            else:
                pv = p
            acc = acc * corr + jax.lax.dot_general(
                pv, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = m_new
        out = acc / jnp.maximum(l, 1e-20)
        o_ref[qi * TILE:(qi + 1) * TILE, :] = out.astype(o_ref.dtype)
        # per-row softmax stats: the backward reuses them instead of a
        # full recompute pass (the classic saved-LSE flash trade)
        m_ref[qi * TILE:(qi + 1) * TILE, :] = m
        l_ref[qi * TILE:(qi + 1) * TILE, :] = l


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, valid_ref, seed_ref, out_ref,
                do_ref, m_ref, l_ref, dq_ref, dk_ref, dv_ref, dk_acc,
                dv_acc, *, plan, slot, scale, s_pad, dropout_rate, dh):
    """Flash backward: per q-tile softmax recompute + tile-skipped grads.

    dk/dv accumulate across q-tiles in VMEM scratch (zeroed per grid step
    — scratch persists across the sequential TPU grid).
    """
    nt = s_pad // TILE
    dk_acc[:] = jnp.zeros_like(dk_acc)
    dv_acc[:] = jnp.zeros_like(dv_acc)
    head = pl.program_id(1)

    for qi in range(nt):
        ks = [int(plan[qi, ki]) for ki in range(nt)]
        if not any(ks):
            dq_ref[qi * TILE:(qi + 1) * TILE, :] = jnp.zeros(
                (TILE, dh), dq_ref.dtype)
            continue
        qs = q_ref[qi * TILE:(qi + 1) * TILE, :
                   ].astype(jnp.float32) * scale
        do = do_ref[qi * TILE:(qi + 1) * TILE, :
                    ].astype(jnp.float32)
        out = out_ref[qi * TILE:(qi + 1) * TILE, :
                      ].astype(jnp.float32)
        dvec = jnp.sum(do * out, axis=-1, keepdims=True)  # [TILE, 1]

        def s_tile(ki, kind):
            k = k_ref[ki * TILE:(ki + 1) * TILE, :
                      ].astype(jnp.float32)
            s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if kind == 2:
                sl = int(slot[qi, ki])
                s = s + bias_ref[sl * TILE:(sl + 1) * TILE, :].astype(
                    jnp.float32)
            return s + valid_ref[ki * TILE:(ki + 1) * TILE][None, :], k

        # row stats saved by the forward (no recompute pass)
        m = m_ref[qi * TILE:(qi + 1) * TILE, :]
        l = l_ref[qi * TILE:(qi + 1) * TILE, :]
        inv_l = 1.0 / jnp.maximum(l, 1e-20)

        # pass B: grads
        dq = jnp.zeros((TILE, dh), jnp.float32)
        for ki in range(nt):
            if ks[ki] == 0:
                continue
            s, k = s_tile(ki, ks[ki])
            p = jnp.exp(s - m) * inv_l                    # [TILE, TILE]
            v = v_ref[ki * TILE:(ki + 1) * TILE, :
                      ].astype(jnp.float32)
            if dropout_rate > 0.0:
                keep = _keep_scale(seed_ref, head, qi, ki, dropout_rate)
                pv = p * keep                             # p_tilde
            else:
                keep = None
                pv = p
            dv_acc[ki * TILE:(ki + 1) * TILE, :] += \
                jax.lax.dot_general(
                    pv, do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if keep is not None:
                dp = dp * keep
            ds = p * (dp - dvec)
            dq = dq + jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dk = ds^T . (q * scale): the scale folds in through qs
            dk_acc[ki * TILE:(ki + 1) * TILE, :] += \
                jax.lax.dot_general(
                    ds, qs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        dq_ref[qi * TILE:(qi + 1) * TILE, :] = (
            dq * scale).astype(dq_ref.dtype)

    dk_ref[:] = dk_acc[:].astype(dk_ref.dtype)
    dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_attn(q, k, v, valid, seed, scale, layout_cache, interpret,
                dropout_rate, dh):
    out, _, _ = _flash_attn_impl(q, k, v, valid, seed, scale, layout_cache,
                                 interpret, dropout_rate, dh)
    return out


def _flash_attn_impl(q, k, v, valid, seed, scale, layout_cache, interpret,
                     dropout_rate, dh):
    """q, k, v: [B, H, s_pad, dh] — per-head blocks with the head axis as
    a leading block axis (Mosaic requires the trailing block dims to be
    tile-aligned or full; dh stays UNPADDED, unlike the earlier 64->128
    lane padding that doubled kernel flops and HBM bytes)."""
    plan, bias, slot = layout_cache
    s_pad = q.shape[2]
    kernel = functools.partial(_kernel, plan=plan, slot=slot, scale=scale,
                               s_pad=s_pad, dropout_rate=dropout_rate,
                               dh=dh)
    grid = (q.shape[0], q.shape[1])
    spec4 = pl.BlockSpec((None, None, s_pad, dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((None, None, s_pad, 1), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_c = jnp.asarray(bias, jnp.bfloat16)    # 0 / -1e9: exact in bf16
    bias_shape = bias.shape
    B, H = q.shape[0], q.shape[1]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec4, spec4, spec4,
            pl.BlockSpec(bias_shape, lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, s_pad), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[spec4, stat, stat],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, H, s_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, s_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias_c, valid, seed)


def _flash_attn_fwd(q, k, v, valid, seed, scale, layout_cache, interpret,
                    dropout_rate, dh):
    out, m, l = _flash_attn_impl(q, k, v, valid, seed, scale, layout_cache,
                                 interpret, dropout_rate, dh)
    return out, (q, k, v, valid, seed, out, m, l)


def _flash_attn_bwd(scale, layout_cache, interpret, dropout_rate, dh,
                    res, dout):
    q, k, v, valid, seed, out, m_s, l_s = res
    plan, bias, slot = layout_cache
    s_pad = q.shape[2]
    kernel = functools.partial(_bwd_kernel, plan=plan, slot=slot,
                               scale=scale, s_pad=s_pad,
                               dropout_rate=dropout_rate, dh=dh)
    grid = (q.shape[0], q.shape[1])
    spec4 = pl.BlockSpec((None, None, s_pad, dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((None, None, s_pad, 1), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_c = jnp.asarray(bias, jnp.bfloat16)
    bias_shape = bias.shape
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec4, spec4, spec4,
            pl.BlockSpec(bias_shape, lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, s_pad), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec4, spec4, stat, stat,
        ],
        out_specs=[spec4, spec4, spec4],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        scratch_shapes=[pltpu.VMEM((s_pad, dh), jnp.float32),
                        pltpu.VMEM((s_pad, dh), jnp.float32)],
        interpret=interpret,
    )(q, k, v, bias_c, valid, seed, out, dout, m_s, l_s)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, None, dseed


_flash_attn.defvjp(_flash_attn_fwd, _flash_attn_bwd)


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "seq_len", "main_context", "right_context", "interpret",
    "dropout_rate"))
def blockwise_flash_attention_packed(q, k, v, key_padding_mask,
                                     num_heads: int, seq_len: int,
                                     main_context: int, right_context: int,
                                     interpret: bool = False,
                                     dropout_rate: float = 0.0,
                                     dropout_rng=None):
    """q, k, v: [B, S, D] packed activations (D = num_heads * head_dim),
    S = total_len of ``block_layout(seq_len, mc, rc)`` (rc copies
    appended); key_padding_mask: [B, S] bool, True = padded key (the
    *extended* mask, rc-copy section included — padding there is not
    contiguous).

    ``dropout_rate`` > 0 (training) applies attention dropout to the
    normalized probabilities in-kernel via the TPU hardware PRNG seeded
    from ``dropout_rng``; the RNG stream differs from the dense XLA
    path's (threefry) — statistically equivalent, bit-different.

    Returns [B, S, D]; padded query rows hold garbage (stripped by the
    caller along with the rc copies).
    """
    from wav2vec_s_tpu.ops.block_mask import block_layout

    # Mosaic only targets TPU; interpret mode keeps the op usable in CPU
    # tests without callers having to thread the flag
    interpret = interpret or jax.default_backend() != "tpu"
    layout = block_layout(seq_len, main_context, right_context)
    B, S, D = q.shape
    # callers may pre-pad the whole layer stack to the kernel tiling so
    # the per-layer pad/slice copies vanish (padded rows = masked keys)
    assert S in (layout.total_len, -(-layout.total_len // TILE) * TILE), (
        S, layout.total_len)
    dh = D // num_heads

    if (dropout_rate > 0.0 and interpret) or dh % 8:
        # jnp reference with identical semantics (no TPU PRNG off-device /
        # unsupported head widths)
        allowed = np.zeros((S, S), bool)
        tl = layout.total_len
        allowed[:tl, :tl] = layout.allowed
        bias = jnp.asarray(np.where(allowed, 0.0, NEG),
                           jnp.float32)[None, None]
        bias = bias + jnp.where(key_padding_mask, NEG, 0.0)[:, None, None, :]
        split = lambda t: t.reshape(B, S, num_heads, dh).transpose(
            0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        p = jax.nn.softmax(s + bias, axis=-1)
        if dropout_rate > 0.0:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                        p.shape)
            p = p * keep / (1.0 - dropout_rate)
        o = jnp.einsum("bhqk,bhkd->bhqd", p,
                       split(v).astype(jnp.float32)).astype(q.dtype)
        return o.transpose(0, 2, 1, 3).reshape(B, S, D)

    s_pad = -(-S // TILE) * TILE
    plan, bias, slot = _tile_plan(layout.allowed, s_pad)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, s_pad - S), (0, 0)))

    # per-head [B, H, s_pad, dh] operands: one relayout per operand, but
    # dh stays unpadded (the 64->128 lane pad doubled kernel work) and
    # Mosaic's trailing-dim rule is satisfied ((s_pad, dh-full))
    four = lambda t: pad(t).reshape(B, s_pad, num_heads, dh).transpose(
        0, 2, 1, 3)
    qp, kp, vp = four(q), four(k), four(v)
    valid = jnp.pad(jnp.where(key_padding_mask, NEG, 0.0).astype(jnp.float32),
                    ((0, 0), (0, s_pad - S)), constant_values=NEG)[:, None, :]

    if dropout_rate > 0.0:
        seed = jax.random.randint(dropout_rng, (1,), 0, 2 ** 31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    # differentiable path: the custom_vjp routes the backward through the
    # tile-skipped flash backward kernel
    out = _flash_attn(qp, kp, vp, valid, seed, dh ** -0.5,
                      (plan, bias, slot), interpret, dropout_rate, dh)
    return out.transpose(0, 2, 1, 3).reshape(B, s_pad, D)[:, :S, :]


def blockwise_flash_attention(q, k, v, key_padding_mask, seq_len: int,
                              main_context: int, right_context: int,
                              interpret: bool = False,
                              dropout_rate: float = 0.0,
                              dropout_rng=None):
    """[B, H, S, Dh] head-split adapter over the packed kernel (tests and
    legacy callers; the hot path calls the packed form directly to avoid
    the transpose)."""
    B, H, S, Dh = q.shape
    packed = lambda t: t.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)
    out = blockwise_flash_attention_packed(
        packed(q), packed(k), packed(v), key_padding_mask, H, seq_len,
        main_context, right_context, interpret=interpret,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng)
    return out.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
