"""Fused incremental-chunk attention (Pallas, TPU).

The incremental blockwise encoder attends a chunk of R new rows against
(a) the committed K/V cache (frames < t0) and (b) the chunk itself under
the intra-chunk block mask.  The XLA lowering materializes the f32 logits
``[B, H, R, T_cap + R]`` in HBM and runs softmax as separate passes —
profiling the fused agent scan showed those passes (reshape / sub /
convert / transpose) costing ~3x the matmul core.  This kernel keeps the
whole (score -> softmax -> weighted sum) per stream in VMEM:

- grid (B,): each program reads its stream's [T_cap, H, Dh] cache slice
  once (the TIME-MAJOR cache layout of stream/incremental.py makes the
  slice cheap) and loops the heads with static [R, Dh] tiles;
- cache columns >= t0 are masked with a scalar-prefetched offset, so one
  compiled kernel serves every chunk position;
- the intra-chunk block mask enters as a compile-time [R, R] bias.

Inference-only (the incremental encoder path); no backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _kernel(t0_ref, q_ref, kc_ref, vc_ref, kn_ref, vn_ref, bias_ref,
            o_ref, *, n_heads):
    t0 = t0_ref[0]
    bias = bias_ref[:]
    for h in range(n_heads):
        q = q_ref[h].astype(jnp.float32)            # [R, Dh] (pre-scaled)
        kc = kc_ref[:, h, :].astype(jnp.float32)    # [T_cap, Dh]
        kn = kn_ref[h].astype(jnp.float32)          # [R, Dh]

        s1 = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s1.shape, 1)
        s1 = jnp.where(col < t0, s1, NEG)           # committed frames only
        s2 = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s2 = s2 + bias

        m = jnp.maximum(jnp.max(s1, axis=1, keepdims=True),
                        jnp.max(s2, axis=1, keepdims=True))
        p1 = jnp.exp(s1 - m)
        p2 = jnp.exp(s2 - m)
        l = (jnp.sum(p1, axis=1, keepdims=True)
             + jnp.sum(p2, axis=1, keepdims=True))
        inv = 1.0 / jnp.maximum(l, 1e-20)
        vc = vc_ref[:, h, :].astype(jnp.float32)
        vn = vn_ref[h].astype(jnp.float32)
        o = (jax.lax.dot_general(p1 * inv, vc, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(p2 * inv, vn, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32))
        o_ref[h] = o.astype(o_ref.dtype)


def chunk_cache_attention(q, k_cache, v_cache, k_new, v_new, intra_bias,
                          t0, n_heads: int, interpret: bool = False):
    """q/k_new/v_new: [B, R, D] chunk rows (q pre-scaled by Dh**-0.5);
    k_cache/v_cache: time-major [T_cap, B, D]; intra_bias: [R, R] additive
    (block mask); t0: scalar int32 — frames committed in the cache.
    Returns [B, R, D].

    NOT jitted itself: always called from an already-jitted step/scan (an
    inner jit inside lax.scan trips a lowering-cache bug).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    B, R, D = q.shape
    t_cap = k_cache.shape[0]
    H = n_heads
    Dh = D // H

    def heads(x):                      # [B, R, D] -> [B, H, R, Dh]
        return x.reshape(B, R, H, Dh).transpose(0, 2, 1, 3)

    def cache4(x):                     # [T, B, D] -> [T, B, H, Dh] (view)
        return x.reshape(t_cap, B, H, Dh)

    kernel = functools.partial(_kernel, n_heads=H)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # t0
            pl.BlockSpec((None, H, R, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # q
            pl.BlockSpec((t_cap, None, H, Dh), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),            # k_cache
            pl.BlockSpec((t_cap, None, H, Dh), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),            # v_cache
            pl.BlockSpec((None, H, R, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # k_new
            pl.BlockSpec((None, H, R, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # v_new
            pl.BlockSpec((R, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),            # intra bias
        ],
        out_specs=pl.BlockSpec((None, H, R, Dh), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, R, Dh), q.dtype),
        interpret=interpret,
    )(jnp.asarray(t0, jnp.int32).reshape(1),
      heads(q), cache4(k_cache), cache4(v_cache), heads(k_new),
      heads(v_new), intra_bias)
    return out.transpose(0, 2, 1, 3).reshape(B, R, D)
