"""Incremental blockwise encoder with device-side KV caches (O(T) streaming).

The quality path (`stream/engine.py`) re-encodes the full prefix per chunk —
simple, but O(T^2) over a stream.  This module is the throughput path: the
functional equivalent of the reference's cached `forward_infer`
(rain/layers/unidirect_w2v2_encoder.py:332-440 — per-layer KV caches with
right-context rollback), redesigned for XLA:

- one jitted `step` with *static* shapes processes `mc` new frames plus the
  `rc` look-ahead for every stream in the batch;
- per-layer K/V of the `mc` main frames append into fixed-capacity cache
  buffers at `dynamic_update_slice` offsets (the reference's
  `rollback_steps` disappears: look-ahead K/V are simply never written);
- the block-attention rule collapses to "cached frames (blocks < b) + the
  whole current chunk (block b main + its look-ahead copies)", exactly the
  training mask restricted to the new rows.

Equality with the full blockwise re-encode is asserted in
tests/test_incremental.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from wav2vec_s_tpu.models.feature_extractor import (
    ConvFeatureExtractor, conv_receptive_stride)
from wav2vec_s_tpu.models.modules import fp32_layer_norm
from wav2vec_s_tpu.ops.block_mask import MASK_VALUE
from wav2vec_s_tpu.utils.positional import sinusoidal_table, POS_OFFSET

class IncrementalEncoderState(struct.PyTreeNode):
    # per-layer tuples of TIME-MAJOR [T_cap, N, D] buffers.  Two layout
    # rules, both load-bearing for HBM:
    # - independent per-layer buffers (a stacked [L, ...] array would copy
    #   the WHOLE multi-layer buffer on every per-layer write-back);
    # - time major: the per-chunk append is a dynamic_update_slice on the
    #   LEADING axis, which is exactly the layout XLA's loop analysis
    #   prefers — batch-major carries made XLA keep a second, transposed
    #   copy of every cache inside the fused scan (2x HBM, capping the
    #   stream batch at half the chip).
    k_cache: tuple
    v_cache: tuple
    out_cache: jnp.ndarray   # [T_cap, N, D] encoder outputs (time-major)
    t_main: jnp.ndarray      # scalar int32: frames cached so far


def init_state(n_streams: int, n_layers: int, dim: int, t_cap: int,
               dtype=jnp.float32, out_dim: int | None = None
               ) -> IncrementalEncoderState:
    z = tuple(jnp.zeros((t_cap, n_streams, dim), dtype)
              for _ in range(n_layers))
    return IncrementalEncoderState(
        k_cache=z, v_cache=z,
        out_cache=jnp.zeros((t_cap, n_streams, out_dim or dim), dtype),
        t_main=jnp.zeros((), jnp.int32))


def _dense(p, x):
    y = jnp.einsum("...d,df->...f", x, p["kernel"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _ln(p, x):
    return fp32_layer_norm(x, p["scale"], p["bias"])


class IncrementalBlockwiseEncoder:
    """Binds a Wav2Vec2 param tree to the jitted incremental step."""

    def __init__(self, w2v_cfg, params, n_streams: int, t_cap: int = 2048,
                 blocks_per_step: int = 1, fused_attention=None, proj=None):
        assert w2v_cfg.extractor_mode == "layer_norm", (
            "incremental streaming needs the stateless (layer-norm) conv "
            "front-end; 'default' group-norm normalizes over time")
        self.cfg = w2v_cfg
        self.params = params          # the Wav2Vec2Model subtree
        self.n = n_streams
        self.t_cap = t_cap
        self.mc = w2v_cfg.main_context
        self.rc = w2v_cfg.right_context
        # DECISION_STEP: blocks advanced per step (reference
        # --step-read-blocks); raises per-chunk arithmetic intensity
        self.blocks = blocks_per_step
        self.n_main = self.mc * blocks_per_step
        rf, hop = conv_receptive_stride(w2v_cfg.conv_feature_layers)
        self.hop, self.rf = hop, rf
        # samples covering frames [t, t + n_main + rc)
        self.window = (self.n_main + self.rc - 1) * hop + rf
        self._conv = ConvFeatureExtractor(
            conv_layers=w2v_cfg.conv_feature_layers,
            mode=w2v_cfg.extractor_mode,
            layer_norm_num=w2v_cfg.layer_norm_num,
            conv_bias=w2v_cfg.conv_bias,
            dtype=w2v_cfg.compute_dtype)
        self._table = sinusoidal_table(
            t_cap + POS_OFFSET + 2, w2v_cfg.encoder_embed_dim)
        # optional --use-linear-layer output projection (params dict with
        # kernel/[bias]); applied to committed rows so the out_cache holds
        # projected features and every downstream consumer just works
        self.proj = proj
        self.out_dim = (proj["kernel"].shape[1] if proj is not None
                        else w2v_cfg.encoder_embed_dim)
        # fused Pallas chunk attention (ops/chunk_attention.py) avoids the
        # HBM logits + separate softmax passes, but measured end-to-end on
        # v5e it LOSES to the XLA einsum path inside the fused corpus scan
        # (the scan-carry relayout XLA inserts before the kernel costs more
        # than the softmax passes it saves: full-agent 581 vs 689
        # audio-s/s).  Default off; kept available + parity-tested for
        # revisiting when the carry-layout issue is fixed upstream.
        self.fused_attention = bool(fused_attention)

        self.step_fn = self._make_step(flush=False)    # pure, for fusion
        self.flush_fn = self._make_step(flush=True)
        self._step = jax.jit(self.step_fn)
        self._flush = jax.jit(self.flush_fn)
        self._cap_steps = {}

    def step_fn_cap(self, kv_cap: int, flush: bool = False):
        """Step variant whose cache attention reads only the first
        ``kv_cap`` cache rows (static slice).  Valid while t_main <= kv_cap;
        the fused corpus scans segment their chunk loops by these caps so
        early chunks stop paying full-capacity HBM reads."""
        key = (kv_cap, flush)
        fn = self._cap_steps.get(key)
        if fn is None:
            fn = self._cap_steps[key] = self._make_step(flush, kv_cap)
        return fn

    # -- the step ------------------------------------------------------
    def _make_step(self, flush: bool, kv_cap: int | None = None):
        c = self.cfg
        mc, rc, B_s = self.mc, self.rc, self.blocks
        n_main = self.n_main
        n_frames = n_main + rc        # conv frames needed per step
        # row layout: [main frames (n_main); copies of block j = frames
        # [(j+1)mc, (j+1)mc+rc) for j = 0..B_s-1] — block j's look-ahead,
        # processed with block-j context (the training-mask semantics)
        copy_src = np.concatenate(
            [np.arange((j + 1) * mc, (j + 1) * mc + rc)
             for j in range(B_s)]) if rc else np.zeros(0, np.int64)
        n_rows = n_main + B_s * rc
        row_block = np.concatenate(
            [np.arange(n_main) // mc, np.repeat(np.arange(B_s), rc)])
        key_is_copy = np.concatenate(
            [np.zeros(n_main, bool), np.ones(B_s * rc, bool)])
        # intra-chunk visibility: main keys blk<=q, copy keys blk==q
        allowed = np.where(
            key_is_copy[None, :],
            row_block[:, None] == row_block[None, :],
            row_block[:, None] >= row_block[None, :])
        intra_bias = np.where(allowed, 0.0, -1e4).astype(np.float32)
        row_pos = np.concatenate([np.arange(n_main), copy_src])
        n_keep = n_main + rc if flush else n_main
        kv_cap_ = self.t_cap if kv_cap is None else kv_cap

        def step(params, state: IncrementalEncoderState, window):
            """window: [N, W] raw samples covering frames
            [t_main, t_main + n_main + rc)."""
            feats = self._conv.apply(
                {"params": params["feature_extractor"]}, window)
            feats = feats[:, :n_frames]
            feats = _ln(params["layer_norm"], feats)
            if "post_extract_proj" in params:
                feats = _dense(params["post_extract_proj"], feats)

            enc_p = params["encoder"]
            # positions: global frame index + fairseq offset
            pos = jax.lax.dynamic_slice_in_dim(
                self._table, state.t_main + POS_OFFSET, n_frames, 0)
            feats = feats + pos[None].astype(feats.dtype)
            if not c.layer_norm_first:
                feats = _ln(enc_p["layer_norm"], feats)
            # assemble chunk rows: main frames + per-block look-ahead copies
            if rc:
                x = jnp.concatenate(
                    [feats[:, :n_main],
                     feats[:, jnp.asarray(copy_src)]], axis=1)
            else:
                x = feats[:, :n_main]

            t0 = state.t_main
            # key visibility: cached frames < t0, plus the intra-chunk mask
            # (kept as two additive parts — the attention below never
            # concatenates the cache and intra logits)
            cache_vis = (jnp.arange(kv_cap_)[None, :]
                         < t0)                              # [1, kv_cap]
            bias_c4 = jnp.where(cache_vis, 0.0,
                                MASK_VALUE)[None, None]     # [1,1,1,T_cap]
            bias_i4 = jnp.asarray(intra_bias)[None, None]   # [1,1,R,R]

            H = c.encoder_attention_heads
            D = c.encoder_embed_dim
            Dh = D // H
            new_k = list(state.k_cache)
            new_v = list(state.v_cache)

            for i in range(c.encoder_layers):
                lp = enc_p["layers"][f"layer_{i}"]
                att = lp["self_attn"]
                # pre-LN (large config): project Q/K/V from LN(x); post-LN:
                # from x directly (wav2vec2.py:934-978 two orderings)
                h_in = (_ln(lp["self_attn_layer_norm"], x)
                        if c.layer_norm_first else x)
                q = _dense(att["q_proj"], h_in) * (Dh ** -0.5)
                k_new = _dense(att["k_proj"], h_in)
                v_new = _dense(att["v_proj"], h_in)
                cache_dtype = state.k_cache[i].dtype

                def split(t):
                    B, T, _ = t.shape
                    return t.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)

                def split_tm(t):
                    T, B, _ = t.shape                    # time-major cache
                    return t.reshape(T, B, H, Dh)

                if self.fused_attention:
                    from wav2vec_s_tpu.ops.chunk_attention import (
                        chunk_cache_attention)
                    o = chunk_cache_attention(
                        q, state.k_cache[i][:kv_cap_].astype(x.dtype),
                        state.v_cache[i][:kv_cap_].astype(x.dtype), k_new,
                        v_new, jnp.asarray(intra_bias), t0, H)
                else:
                    qh = split(q)                        # [B, H, R, Dh]
                    kc = split_tm(state.k_cache[i][:kv_cap_].astype(x.dtype))
                    vc = split_tm(state.v_cache[i][:kv_cap_].astype(x.dtype))
                    # scores against the cache (time-major operand read in
                    # place) and against the current chunk rows; TWO-PART
                    # online softmax — the concatenated [.., T_cap+R] f32
                    # logits never materialize (the softmax passes over
                    # that tensor were ~half the scan's HBM time)
                    lg_cache = jnp.einsum(
                        "bhqd,tbhd->bhqt", qh, kc,
                        preferred_element_type=jnp.float32) + bias_c4
                    lg_intra = jnp.einsum(
                        "bhqd,bhkd->bhqk", qh, split(k_new),
                        preferred_element_type=jnp.float32) + bias_i4
                    m = jnp.maximum(lg_cache.max(-1, keepdims=True),
                                    lg_intra.max(-1, keepdims=True))
                    e1 = jnp.exp(lg_cache - m)
                    e2 = jnp.exp(lg_intra - m)
                    inv = 1.0 / (e1.sum(-1, keepdims=True)
                                 + e2.sum(-1, keepdims=True))
                    p1 = (e1 * inv).astype(x.dtype)
                    p2 = (e2 * inv).astype(x.dtype)
                    o = (jnp.einsum("bhqt,tbhd->bhqd", p1, vc)
                         + jnp.einsum("bhqk,bhkd->bhqd", p2,
                                      split(v_new)))
                    o = o.transpose(0, 2, 1, 3).reshape(x.shape)
                h = _dense(att["out_proj"], o)

                # cache the main frames' K/V (+ final look-ahead at flush)
                if flush and rc:
                    keep_k = jnp.concatenate(
                        [k_new[:, :n_main], k_new[:, n_rows - rc:]], axis=1)
                    keep_v = jnp.concatenate(
                        [v_new[:, :n_main], v_new[:, n_rows - rc:]], axis=1)
                else:
                    keep_k = k_new[:, :n_keep]
                    keep_v = v_new[:, :n_keep]
                new_k[i] = jax.lax.dynamic_update_slice_in_dim(
                    new_k[i], keep_k.swapaxes(0, 1).astype(cache_dtype),
                    t0, axis=0)
                new_v[i] = jax.lax.dynamic_update_slice_in_dim(
                    new_v[i], keep_v.swapaxes(0, 1).astype(cache_dtype),
                    t0, axis=0)

                if c.layer_norm_first:
                    x = x + h
                    hf = _dense(lp["fc2"], jax.nn.gelu(
                        _dense(lp["fc1"], _ln(lp["final_layer_norm"], x)),
                        approximate=False))
                    x = x + hf
                else:
                    x = _ln(lp["self_attn_layer_norm"], x + h)
                    hf = _dense(lp["fc2"], jax.nn.gelu(
                        _dense(lp["fc1"], x), approximate=False))
                    x = _ln(lp["final_layer_norm"], x + hf)

            x_out = (_ln(enc_p["layer_norm"], x) if c.layer_norm_first
                     else x)   # pre-LN: the post-stack norm (wav2vec2.py:869)
            if flush and rc:
                commit = jnp.concatenate(
                    [x_out[:, :n_main], x_out[:, n_rows - rc:]], axis=1)
            else:
                commit = x_out[:, :n_keep]
            if self.proj is not None:
                commit = _dense(self.proj, commit)  # --use-linear-layer
            out_cache = jax.lax.dynamic_update_slice_in_dim(
                state.out_cache,
                commit.swapaxes(0, 1).astype(state.out_cache.dtype),
                t0, axis=0)
            new_state = IncrementalEncoderState(
                k_cache=tuple(new_k), v_cache=tuple(new_v),
                out_cache=out_cache, t_main=t0 + n_keep)
            return new_state

        return step

    # -- serving step ----------------------------------------------------
    def make_serving_step(self, kv_cap: int | None = None):
        """Step variant for CONTINUOUS BATCHING (stream/serving.py): slots
        at different stream positions share lockstep global cache rows.

        Differences from the corpus step:
        - positions come from per-slot frame counts (``frames_done [N]``),
          not the global write offset — each slot's positions stay
          contiguous from its own 0 even though its rows are scattered
          across global time;
        - cached-key visibility is a per-slot boolean PLANE
          (``vis [N, t_cap]``, True = row belongs to this slot's stream),
          not the shared ``row < t_main`` lower bound — rows written while
          a slot was absent/stalled stay invisible to it forever;
        - every step commits ``n_main + rc`` rows (the flush layout):
          the caller marks the rc tail visible only for slots that end
          their stream this step, other slots simply waste those rows
          (compaction reclaims them).

        Returns step(params, state, window, frames_done) -> new state; the
        visibility plane is managed by the caller (it is serving-session
        state, not encoder state).
        """
        c = self.cfg
        mc, rc, B_s = self.mc, self.rc, self.blocks
        n_main = self.n_main
        n_frames = n_main + rc
        copy_src = np.concatenate(
            [np.arange((j + 1) * mc, (j + 1) * mc + rc)
             for j in range(B_s)]) if rc else np.zeros(0, np.int64)
        n_rows = n_main + B_s * rc
        row_block = np.concatenate(
            [np.arange(n_main) // mc, np.repeat(np.arange(B_s), rc)])
        key_is_copy = np.concatenate(
            [np.zeros(n_main, bool), np.ones(B_s * rc, bool)])
        allowed = np.where(
            key_is_copy[None, :],
            row_block[:, None] == row_block[None, :],
            row_block[:, None] >= row_block[None, :])
        intra_bias = np.where(allowed, 0.0, -1e4).astype(np.float32)
        kv_cap_ = self.t_cap if kv_cap is None else kv_cap
        n_keep = n_main + rc

        def step(params, state: IncrementalEncoderState, window,
                 frames_done, vis):
            feats = self._conv.apply(
                {"params": params["feature_extractor"]}, window)
            feats = feats[:, :n_frames]
            feats = _ln(params["layer_norm"], feats)
            if "post_extract_proj" in params:
                feats = _dense(params["post_extract_proj"], feats)

            enc_p = params["encoder"]
            # per-slot positions: slot-local frame index + fairseq offset
            pos_idx = (frames_done[:, None]
                       + jnp.arange(n_frames)[None] + POS_OFFSET)
            feats = feats + self._table[pos_idx].astype(feats.dtype)
            if not c.layer_norm_first:
                feats = _ln(enc_p["layer_norm"], feats)
            if rc:
                x = jnp.concatenate(
                    [feats[:, :n_main],
                     feats[:, jnp.asarray(copy_src)]], axis=1)
            else:
                x = feats[:, :n_main]

            t0 = state.t_main
            # per-slot plane instead of the shared lower bound
            bias_c4 = jnp.where(vis[:, :kv_cap_], 0.0,
                                MASK_VALUE)[:, None, None, :]  # [N,1,1,cap]
            bias_i4 = jnp.asarray(intra_bias)[None, None]

            H = c.encoder_attention_heads
            D = c.encoder_embed_dim
            Dh = D // H
            new_k = list(state.k_cache)
            new_v = list(state.v_cache)

            for i in range(c.encoder_layers):
                lp = enc_p["layers"][f"layer_{i}"]
                att = lp["self_attn"]
                h_in = (_ln(lp["self_attn_layer_norm"], x)
                        if c.layer_norm_first else x)
                q = _dense(att["q_proj"], h_in) * (Dh ** -0.5)
                k_new = _dense(att["k_proj"], h_in)
                v_new = _dense(att["v_proj"], h_in)
                cache_dtype = state.k_cache[i].dtype

                def split(t):
                    B, T, _ = t.shape
                    return t.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)

                def split_tm(t):
                    T, B, _ = t.shape
                    return t.reshape(T, B, H, Dh)

                qh = split(q)
                kc = split_tm(state.k_cache[i][:kv_cap_].astype(x.dtype))
                vc = split_tm(state.v_cache[i][:kv_cap_].astype(x.dtype))
                lg_cache = jnp.einsum(
                    "bhqd,tbhd->bhqt", qh, kc,
                    preferred_element_type=jnp.float32) + bias_c4
                lg_intra = jnp.einsum(
                    "bhqd,bhkd->bhqk", qh, split(k_new),
                    preferred_element_type=jnp.float32) + bias_i4
                m = jnp.maximum(lg_cache.max(-1, keepdims=True),
                                lg_intra.max(-1, keepdims=True))
                e1 = jnp.exp(lg_cache - m)
                e2 = jnp.exp(lg_intra - m)
                inv = 1.0 / (e1.sum(-1, keepdims=True)
                             + e2.sum(-1, keepdims=True))
                p1 = (e1 * inv).astype(x.dtype)
                p2 = (e2 * inv).astype(x.dtype)
                o = (jnp.einsum("bhqt,tbhd->bhqd", p1, vc)
                     + jnp.einsum("bhqk,bhkd->bhqd", p2, split(v_new)))
                o = o.transpose(0, 2, 1, 3).reshape(x.shape)
                h = _dense(att["out_proj"], o)

                # flush layout: main rows + the last block's look-ahead
                if rc:
                    keep_k = jnp.concatenate(
                        [k_new[:, :n_main], k_new[:, n_rows - rc:]], axis=1)
                    keep_v = jnp.concatenate(
                        [v_new[:, :n_main], v_new[:, n_rows - rc:]], axis=1)
                else:
                    keep_k, keep_v = k_new, v_new
                new_k[i] = jax.lax.dynamic_update_slice_in_dim(
                    new_k[i], keep_k.swapaxes(0, 1).astype(cache_dtype),
                    t0, axis=0)
                new_v[i] = jax.lax.dynamic_update_slice_in_dim(
                    new_v[i], keep_v.swapaxes(0, 1).astype(cache_dtype),
                    t0, axis=0)

                if c.layer_norm_first:
                    x = x + h
                    hf = _dense(lp["fc2"], jax.nn.gelu(
                        _dense(lp["fc1"], _ln(lp["final_layer_norm"], x)),
                        approximate=False))
                    x = x + hf
                else:
                    x = _ln(lp["self_attn_layer_norm"], x + h)
                    hf = _dense(lp["fc2"], jax.nn.gelu(
                        _dense(lp["fc1"], x), approximate=False))
                    x = _ln(lp["final_layer_norm"], x + hf)

            x_out = (_ln(enc_p["layer_norm"], x) if c.layer_norm_first
                     else x)
            if rc:
                commit = jnp.concatenate(
                    [x_out[:, :n_main], x_out[:, n_rows - rc:]], axis=1)
            else:
                commit = x_out
            if self.proj is not None:
                commit = _dense(self.proj, commit)  # --use-linear-layer
            out_cache = jax.lax.dynamic_update_slice_in_dim(
                state.out_cache,
                commit.swapaxes(0, 1).astype(state.out_cache.dtype),
                t0, axis=0)
            return IncrementalEncoderState(
                k_cache=tuple(new_k), v_cache=tuple(new_v),
                out_cache=out_cache, t_main=t0 + n_keep)

        return step

    # -- public API ------------------------------------------------------
    def init(self) -> IncrementalEncoderState:
        return init_state(self.n, self.cfg.encoder_layers,
                          self.cfg.encoder_embed_dim, self.t_cap,
                          self.cfg.compute_dtype, out_dim=self.out_dim)

    def step(self, state, window: np.ndarray, flush: bool = False):
        """window: [N, self.window] samples for frames
        [t_main, t_main+mc+rc) (slice the host audio at t_main*hop);
        flush=True also commits the look-ahead frames (end of stream)."""
        fn = self._flush if flush else self._step
        return fn(self.params, state, jnp.asarray(window))
