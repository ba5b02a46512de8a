"""Incremental CAAT decode steps: KV-cached LM + cached jointer.

The single home of the streaming decode math shared by every fused decoder
(stream/batched.py) and the beam searcher.  Functionally mirrors the
reference's incremental path — ``IsolatedDecoder`` with per-layer KV caches
and ``ExpandMultiheadAttention`` encoder-K/V incremental state
(rain/layers/attention_transducer.py:60-287, 667-684,
``TransducerMHADecoder.forward`` :886-905) — but as pure functions over the
flax param tree with fixed-capacity caches and per-stream write offsets, so
the whole corpus decode stays inside one compiled ``lax.scan``.

Semantics are pinned to ``W2V2CaatModel.decode_step`` (the recompute
formulation) by tests/test_caat_step.py for BOTH pre-LN and post-LN layer
orderings; any model change that diverges this path breaks those tests.

Cost model (why this exists): one greedy emission here is O(1) — a
one-token LM step (attention over the cached prefix) plus a one-query
jointer pass over pre-projected encoder K/V.  The recompute path
(``decode_step``) re-runs the full LM over the padded prefix per emission,
which dominated the round-1 agent benchmark.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from wav2vec_s_tpu.models.modules import fp32_layer_norm
from wav2vec_s_tpu.ops.block_mask import MASK_VALUE
from wav2vec_s_tpu.utils.positional import sinusoidal_table, PADDING_IDX


def _dense(p, x):
    y = jnp.einsum("...d,df->...f", x, p["kernel"].astype(x.dtype))
    return y + p["bias"].astype(x.dtype) if "bias" in p else y


def _dense_qkv(att, x):
    """q/k/v projections as ONE [D, 3D] matmul.

    The beam inner loop is op-count-bound (~130 small ops per LM step);
    fusing the three projections drops two matmul+bias pairs per layer.
    The weight concat is loop-invariant, so XLA's while-loop LICM hoists
    it out of the decode loop.  Each output element keeps the exact same
    contraction (the K axis is untouched), so results match the separate
    projections bitwise.
    """
    ws = [att[n]["kernel"] for n in ("q_proj", "k_proj", "v_proj")]
    if all("bias" in att[n] for n in ("q_proj", "k_proj", "v_proj")):
        bs = jnp.concatenate(
            [att[n]["bias"] for n in ("q_proj", "k_proj", "v_proj")])
    else:
        bs = None
    w = jnp.concatenate(ws, axis=1).astype(x.dtype)
    y = jnp.einsum("...d,df->...f", x, w)
    if bs is not None:
        y = y + bs.astype(x.dtype)
    return jnp.split(y, 3, axis=-1)


def _ln(p, x):
    return fp32_layer_norm(x, p["scale"], p["bias"])


class LMState(struct.PyTreeNode):
    """Per-stream incremental LM state.

    k/v: per-layer tuples of TIME-MAJOR [U_cap, N, D] caches of the
    *projected* keys/values (the fairseq ``prev_key/prev_value`` contract,
    multihead_attention.py:197-300) — independent buffers, NOT a stacked
    [L, ...] array, so per-layer scatter updates stay in place instead of
    copying the whole multi-layer buffer every emission; time-major so the
    in-loop layout matches the buffer layout (batch-major carries made XLA
    keep a transposed copy of every cache inside the fused scan);
    h_last: [N, D] LM output at the last prefix position (post final-LN
    when pre-LN config) — the jointer query.
    """

    k: tuple
    v: tuple
    h_last: jnp.ndarray


def _attend_one(q, k_cache, v_cache, idx, n_heads):
    """One-query attention against a per-stream-length cache.

    q: [N, D]; k_cache/v_cache: TIME-MAJOR [U_cap, N, D]; idx: [N] last
    valid cache row per stream (keys j <= idx attend).
    """
    U_cap, N, D = k_cache.shape
    H = n_heads
    Dh = D // H
    qh = q.reshape(N, H, Dh)
    kh = k_cache.reshape(U_cap, N, H, Dh)
    vh = v_cache.reshape(U_cap, N, H, Dh)
    logits = jnp.einsum("nhd,unhd->nhu", qh, kh,
                        preferred_element_type=jnp.float32) * (Dh ** -0.5)
    bias = jnp.where(jnp.arange(U_cap)[None] <= idx[:, None], 0.0,
                     MASK_VALUE)
    logits = logits + bias[:, None, :]
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("nhu,unhd->nhd", p, vh)
    return out.reshape(N, D)


def lm_step(params, cfg, state: LMState, tokens: jnp.ndarray,
            index: jnp.ndarray, advance: jnp.ndarray) -> LMState:
    """Consume one token per stream through the IsolatedDecoder.

    Args:
      params: the W2V2CaatModel param tree (needs ``decoder_lm`` +
        ``embed_tokens``).
      tokens:  [N] token ids appended at prefix position ``index``.
      index:   [N] 0-based position of the new token (== old prefix length).
      advance: [N] bool; streams with False keep their previous
        ``h_last`` (their K/V rows at ``index`` are written but invisible
        until ``index`` grows, so unconditional writes are safe).

    Returns the updated LMState.
    """
    c = cfg
    D = c.decoder_embed_dim
    lm = params["decoder_lm"]
    embed = params.get("embed_tokens", lm.get("embed_tokens"))
    dtype = c.compute_dtype

    x = embed.astype(dtype)[tokens] * (D ** 0.5)                 # [N, D]
    # fairseq positions: token at index i sits at i + 1 + padding_idx
    table = sinusoidal_table(
        c.max_target_positions + PADDING_IDX + 1 + c.rand_pos_decoder, D)
    x = x + table[index + 1 + PADDING_IDX].astype(dtype)

    N = tokens.shape[0]
    rows = jnp.arange(N)
    new_k, new_v = list(state.k), list(state.v)
    for i in range(c.decoder_layers):
        lp = lm[f"layer_{i}"]
        att = lp["self_attn"]
        h_in = (_ln(lp["self_attn_layer_norm"], x)
                if c.decoder_normalize_before else x)
        q, k1, v1 = _dense_qkv(att, h_in)
        new_k[i] = new_k[i].at[index, rows].set(k1.astype(new_k[i].dtype))
        new_v[i] = new_v[i].at[index, rows].set(v1.astype(new_v[i].dtype))
        o = _attend_one(q, new_k[i].astype(dtype), new_v[i].astype(dtype),
                        index, c.decoder_attention_heads)
        h = _dense(att["out_proj"], o)
        if c.decoder_normalize_before:
            x = x + h
            hf = _dense(lp["fc2"], jax.nn.relu(
                _dense(lp["fc1"], _ln(lp["final_layer_norm"], x))))
            x = x + hf
        else:
            x = _ln(lp["self_attn_layer_norm"], x + h)
            hf = _dense(lp["fc2"], jax.nn.relu(_dense(lp["fc1"], x)))
            x = _ln(lp["final_layer_norm"], x + hf)

    if c.decoder_normalize_before:
        x = _ln(lm["layer_norm"], x)
    h_last = jnp.where(advance[:, None], x, state.h_last)
    return LMState(k=tuple(new_k), v=tuple(new_v), h_last=h_last)


class SlotLMState(struct.PyTreeNode):
    """Slot-aligned incremental LM state for lockstep greedy decode.

    Same math as ``LMState``/``lm_step`` but the K/V cache row is the
    *global emission-step counter* (``ptr``), identical for every stream,
    instead of the per-stream prefix position.  Attention is a set
    operation — key order is irrelevant as long as exactly the prefix
    keys are visible — so a per-stream validity plane replaces positional
    masking.  This turns the per-emission cache write from a scatter at
    per-stream indices (which XLA executes as a full-buffer pass) into a
    leading-axis ``dynamic_update_slice`` (in place), and shrinks the
    cache capacity from ``max_len`` to the number of decode iterations
    the chunk loop can execute, cutting the fused scan's loop-carry
    traffic several-fold.  Equivalence with ``lm_step`` is pinned by
    tests/test_caat_step.py.

    k/v: per-layer tuples of [S, N, D] (S = slot capacity); valid: [S, N]
    bool — slot s holds a real prefix key of stream n; ptr: scalar int32
    next write slot; h_last: [N, D] jointer query (as in ``LMState``).
    """

    k: tuple
    v: tuple
    valid: jnp.ndarray
    ptr: jnp.ndarray
    h_last: jnp.ndarray


def _attend_slots(q, k_cache, v_cache, valid, n_heads):
    """One-query attention over slot-aligned caches.

    q: [N, D]; k_cache/v_cache: [S, N, D]; valid: [S, N] bool."""
    S, N, D = k_cache.shape
    H = n_heads
    Dh = D // H
    qh = q.reshape(N, H, Dh)
    kh = k_cache.reshape(S, N, H, Dh)
    vh = v_cache.reshape(S, N, H, Dh)
    logits = jnp.einsum("nhd,snhd->nhs", qh, kh,
                        preferred_element_type=jnp.float32) * (Dh ** -0.5)
    bias = jnp.where(valid.T, 0.0, MASK_VALUE)          # [N, S]
    logits = logits + bias[:, None, :]
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("nhs,snhd->nhd", p, vh)
    return out.reshape(N, D)


def lm_slot_step(params, cfg, state: SlotLMState, tokens: jnp.ndarray,
                 index: jnp.ndarray, advance: jnp.ndarray) -> SlotLMState:
    """Slot-aligned twin of ``lm_step``.

    tokens/index/advance as in ``lm_step`` (``index`` is still the prefix
    position — it drives the positional embedding); the K/V rows land at
    slot ``state.ptr`` and are marked valid only where ``advance``.
    """
    c = cfg
    D = c.decoder_embed_dim
    lm = params["decoder_lm"]
    embed = params.get("embed_tokens", lm.get("embed_tokens"))
    dtype = c.compute_dtype

    x = embed.astype(dtype)[tokens] * (D ** 0.5)                 # [N, D]
    table = sinusoidal_table(
        c.max_target_positions + PADDING_IDX + 1 + c.rand_pos_decoder, D)
    x = x + table[index + 1 + PADDING_IDX].astype(dtype)

    ptr = state.ptr
    # the new row is visible to its own query regardless of ``advance``
    # (a query always attends its own position); commit to the validity
    # plane only where the stream actually advances
    qvalid = jax.lax.dynamic_update_slice_in_dim(
        state.valid, jnp.ones((1,) + state.valid.shape[1:], bool), ptr,
        axis=0)
    new_valid = jax.lax.dynamic_update_slice_in_dim(
        state.valid, advance[None], ptr, axis=0)
    new_k, new_v = list(state.k), list(state.v)
    for i in range(c.decoder_layers):
        lp = lm[f"layer_{i}"]
        att = lp["self_attn"]
        h_in = (_ln(lp["self_attn_layer_norm"], x)
                if c.decoder_normalize_before else x)
        q, k1, v1 = _dense_qkv(att, h_in)
        new_k[i] = jax.lax.dynamic_update_slice_in_dim(
            new_k[i], k1[None].astype(new_k[i].dtype), ptr, axis=0)
        new_v[i] = jax.lax.dynamic_update_slice_in_dim(
            new_v[i], v1[None].astype(new_v[i].dtype), ptr, axis=0)
        o = _attend_slots(q, new_k[i].astype(dtype), new_v[i].astype(dtype),
                          qvalid, c.decoder_attention_heads)
        h = _dense(att["out_proj"], o)
        if c.decoder_normalize_before:
            x = x + h
            hf = _dense(lp["fc2"], jax.nn.relu(
                _dense(lp["fc1"], _ln(lp["final_layer_norm"], x))))
            x = x + hf
        else:
            x = _ln(lp["self_attn_layer_norm"], x + h)
            hf = _dense(lp["fc2"], jax.nn.relu(_dense(lp["fc1"], x)))
            x = _ln(lp["final_layer_norm"], x + hf)

    if c.decoder_normalize_before:
        x = _ln(lm["layer_norm"], x)
    h_last = jnp.where(advance[:, None], x, state.h_last)
    return SlotLMState(k=tuple(new_k), v=tuple(new_v), valid=new_valid,
                       ptr=ptr + 1, h_last=h_last)


def lm_slot_init(params, cfg, n_streams: int, n_slots: int,
                 bos: int | None = None, dtype=None) -> SlotLMState:
    """Empty slot caches + one step on bos (slot 0 = bos, valid for all)."""
    c = cfg
    dtype = dtype or c.compute_dtype
    z = tuple(jnp.zeros((n_slots, n_streams, c.decoder_embed_dim), dtype)
              for _ in range(c.decoder_layers))
    state = SlotLMState(
        k=z, v=z, valid=jnp.zeros((n_slots, n_streams), bool),
        ptr=jnp.zeros((), jnp.int32),
        h_last=jnp.zeros((n_streams, c.decoder_embed_dim), dtype))
    bos_id = c.bos if bos is None else bos
    toks = jnp.full((n_streams,), bos_id, jnp.int32)
    return lm_slot_step(params, cfg, state, toks,
                        jnp.zeros(n_streams, jnp.int32),
                        jnp.ones(n_streams, bool))


class BeamLMState(struct.PyTreeNode):
    """Split-cache incremental LM state for the device-batched beam search.

    The beam block re-seeds every chunk from at most ``inter_beam`` kept
    prefixes per stream (transducer_searcher.py:403-421 rolls its caches
    back to the same common point), so the B beams of a stream share their
    chunk-entry prefix: storing per-beam full-width caches (``LMState``
    over N*B rows) makes every beam iteration gather-and-scatter B
    identical copies of the prefix K/V.  Here the cache splits into

    - a PREFIX part, computed once per chunk by ``lm_prefill`` over the
      N*IB live seed rows and never reordered or written again
      (pk/pv: per-layer [U_pre, NI, D], NI = N*inter_beam; plen: [NI]);
    - a chunk-local SUFFIX part holding only the tokens emitted inside
      the current beam block, slot-aligned on the loop iteration counter
      exactly like ``SlotLMState`` (sk/sv: per-layer [S, N*B, D] with a
      validity plane; S = the block's max emission count);
    - ``origin``: [N*B] local seed index in [0, IB) each beam descends
      from — beam reorders permute beams within a stream, so the prefix
      share stays valid and only origin/suffix/h_last travel.

    Attention is a set operation, so softmax over the concatenated
    (prefix | suffix) logits equals the position-aligned ``lm_step``
    (pinned by tests/test_caat_step.py).  Per-iteration HBM traffic drops
    from O(U_pre * N*B) to O(U_pre * N*IB + S * N*B) — at the published
    inter_beam=1 / beam 5 operating point, ~5x less prefix read and no
    full-width reorder copy.
    """

    pk: tuple
    pv: tuple
    plen: jnp.ndarray
    origin: jnp.ndarray
    # suffix caches STACKED over layers ([L, S, N*B, D]): the per-beam
    # reorder is then ONE gather over each of sk/sv instead of 2*L small
    # per-layer gathers — the reorder was ~1/3 of the beam iteration's
    # wall clock, almost entirely per-op overhead
    sk: jnp.ndarray
    sv: jnp.ndarray
    svalid: jnp.ndarray
    sptr: jnp.ndarray
    h_last: jnp.ndarray


def lm_beam_init(pre: "LMState", plen: jnp.ndarray, origin: jnp.ndarray,
                 n_slots: int, beams: int) -> BeamLMState:
    """Build beam state from a ``lm_prefill`` result over the seed rows.

    pre: LMState with k/v [U_pre, NI, D], h_last [NI, D]; plen: [NI]
    prefix lengths (incl. bos); origin: [N*B] LOCAL seed index in
    [0, IB) per beam (dead beams borrow a live seed — their -inf scores
    keep them out of every reduction, and the first reorder re-points
    them anyway); beams: B (static).
    """
    NI = pre.h_last.shape[0]
    NB = origin.shape[0]
    N = NB // beams
    IB = NI // N
    dtype = pre.k[0].dtype
    D = pre.h_last.shape[-1]
    z = jnp.zeros((len(pre.k), n_slots, NB, D), dtype)
    rows = (jnp.arange(NB) // beams) * IB + origin   # global prefill rows
    return BeamLMState(
        pk=pre.k, pv=pre.v, plen=plen, origin=origin,
        sk=z, sv=z, svalid=jnp.zeros((n_slots, NB), bool),
        sptr=jnp.zeros((), jnp.int32), h_last=pre.h_last[rows])


def lm_beam_reorder(state: BeamLMState, rows: jnp.ndarray) -> BeamLMState:
    """Beam-reorder gather (fairseq ``reorder_incremental_state``): only
    the chunk-local suffix, origin pointers and h_last travel — the shared
    prefix caches are untouched.  ``rows`` must permute beams within a
    stream (the beam expansion's ``n*B + origin_beam`` pattern)."""
    return state.replace(
        origin=state.origin[rows],
        sk=state.sk[:, :, rows],
        sv=state.sv[:, :, rows],
        svalid=state.svalid[:, rows],
        h_last=state.h_last[rows])


def lm_beam_step(params, cfg, state: BeamLMState, tokens: jnp.ndarray,
                 index: jnp.ndarray, advance: jnp.ndarray,
                 beams: int) -> BeamLMState:
    """Split-cache twin of ``lm_step`` for the beam block.

    tokens/index/advance: [N*B] as in ``lm_step`` (``index`` is the new
    token's prefix position and drives the positional embedding); the new
    K/V rows land in the suffix at slot ``state.sptr``.  ``beams`` = B
    (static) groups the row axis as [N, B] for the shared-prefix
    attention.
    """
    c = cfg
    D = c.decoder_embed_dim
    H = c.decoder_attention_heads
    Dh = D // H
    lm = params["decoder_lm"]
    embed = params.get("embed_tokens", lm.get("embed_tokens"))
    dtype = c.compute_dtype
    NB = tokens.shape[0]
    B = beams
    N = NB // B
    U_pre, NI, _ = state.pk[0].shape
    IB = NI // N
    S = state.sk.shape[1]

    x = embed.astype(dtype)[tokens] * (D ** 0.5)                 # [NB, D]
    table = sinusoidal_table(
        c.max_target_positions + PADDING_IDX + 1 + c.rand_pos_decoder, D)
    x = x + table[index + 1 + PADDING_IDX].astype(dtype)

    ptr = state.sptr
    org = state.origin.reshape(N, B)
    plen_nb = jnp.take_along_axis(state.plen.reshape(N, IB), org, 1)  # [N,B]
    pre_bias = jnp.where(
        jnp.arange(U_pre)[None, None] < plen_nb[..., None], 0.0,
        MASK_VALUE)                                          # [N, B, U_pre]
    qvalid = jax.lax.dynamic_update_slice_in_dim(
        state.svalid, jnp.ones((1, NB), bool), ptr, axis=0)
    suf_bias = jnp.where(qvalid.T, 0.0, MASK_VALUE)              # [NB, S]
    new_svalid = jax.lax.dynamic_update_slice_in_dim(
        state.svalid, advance[None], ptr, axis=0)

    new_sk, new_sv = state.sk, state.sv
    for i in range(c.decoder_layers):
        lp = lm[f"layer_{i}"]
        att = lp["self_attn"]
        h_in = (_ln(lp["self_attn_layer_norm"], x)
                if c.decoder_normalize_before else x)
        q, k1, v1 = _dense_qkv(att, h_in)
        new_sk = jax.lax.dynamic_update_slice(
            new_sk, k1[None, None].astype(new_sk.dtype),
            (i, ptr, 0, 0))
        new_sv = jax.lax.dynamic_update_slice(
            new_sv, v1[None, None].astype(new_sv.dtype),
            (i, ptr, 0, 0))

        qh = q.reshape(N, B, H, Dh)
        kp = state.pk[i].astype(dtype).reshape(U_pre, N, IB, H, Dh)
        vp = state.pv[i].astype(dtype).reshape(U_pre, N, IB, H, Dh)
        if IB == 1:
            # the published operating point (--inter-beam 1): one shared
            # seed per stream — skip the per-origin select entirely
            lp_sel = jnp.einsum(
                "nbhd,unhd->nbhu", qh, kp[:, :, 0],
                preferred_element_type=jnp.float32) * (Dh ** -0.5)
        else:
            # logits against every seed's prefix, then select each beam's
            # origin: IB x the logit FLOPs (tiny vs the cache read) buys
            # ONE shared [U_pre, NI, D] read instead of a per-beam gather
            lp_all = jnp.einsum(
                "nbhd,unihd->nbihu", qh, kp,
                preferred_element_type=jnp.float32) * (Dh ** -0.5)
            lp_sel = jnp.take_along_axis(
                lp_all, org[:, :, None, None, None], axis=2)[:, :, 0]
        lp_sel = lp_sel + pre_bias[:, :, None, :]            # [N, B, H, U]

        ks = new_sk[i].astype(dtype).reshape(S, NB, H, Dh)
        vs = new_sv[i].astype(dtype).reshape(S, NB, H, Dh)
        # (stacked [L, S, NB, D]; [i] is a static slice)
        ls = jnp.einsum("mhd,smhd->mhs", q.reshape(NB, H, Dh), ks,
                        preferred_element_type=jnp.float32) * (Dh ** -0.5)
        ls = ls + suf_bias[:, None, :]                       # [NB, H, S]

        both = jnp.concatenate(
            [lp_sel.reshape(NB, H, U_pre), ls], axis=-1)
        p = jax.nn.softmax(both, axis=-1).astype(dtype)
        p_pre = p[..., :U_pre].reshape(N, B, H, U_pre)
        p_suf = p[..., U_pre:]
        if IB == 1:
            o_pre = jnp.einsum("nbhu,unhd->nbhd", p_pre, vp[:, :, 0])
        else:
            o_all = jnp.einsum("nbhu,unihd->nbihd", p_pre, vp)
            o_pre = jnp.take_along_axis(
                o_all, org[:, :, None, None, None], axis=2)[:, :, 0]
        o_suf = jnp.einsum("mhs,smhd->mhd", p_suf, vs)
        o = o_pre.reshape(NB, H, Dh) + o_suf
        h = _dense(att["out_proj"], o.reshape(NB, D))
        if c.decoder_normalize_before:
            x = x + h
            hf = _dense(lp["fc2"], jax.nn.relu(
                _dense(lp["fc1"], _ln(lp["final_layer_norm"], x))))
            x = x + hf
        else:
            x = _ln(lp["self_attn_layer_norm"], x + h)
            hf = _dense(lp["fc2"], jax.nn.relu(_dense(lp["fc1"], x)))
            x = _ln(lp["final_layer_norm"], x + hf)

    if c.decoder_normalize_before:
        x = _ln(lm["layer_norm"], x)
    h_last = jnp.where(advance[:, None], x, state.h_last)
    return state.replace(sk=new_sk, sv=new_sv,
                         svalid=new_svalid, sptr=ptr + 1, h_last=h_last)


def lm_prefill(params, cfg, tokens: jnp.ndarray, lens: jnp.ndarray,
               u_cap: int) -> LMState:
    """Full-prefix LM forward that ALSO materializes the per-layer K/V
    caches — one recompute per chunk instead of per emission.

    The batched beam decoder re-seeds its beams from host-merged prefixes
    every chunk; this builds the incremental state those prefixes would
    have produced through ``lm_step`` (pinned by tests/test_caat_step.py).

    tokens: [K, U] right-padded (bos first); lens: [K]; u_cap >= U cache
    capacity.  Returns LMState with k/v [u_cap, K, D] and ``h_last`` at
    position lens-1.
    """
    c = cfg
    D = c.decoder_embed_dim
    H = c.decoder_attention_heads
    Dh = D // H
    lm = params["decoder_lm"]
    embed = params.get("embed_tokens", lm.get("embed_tokens"))
    dtype = c.compute_dtype
    K, U = tokens.shape

    x = embed.astype(dtype)[tokens] * (D ** 0.5)                # [K, U, D]
    table = sinusoidal_table(
        c.max_target_positions + PADDING_IDX + 1 + c.rand_pos_decoder, D)
    x = x + table[jnp.arange(U) + 1 + PADDING_IDX][None].astype(dtype)

    causal = jnp.where(
        jnp.arange(U)[None, :] <= jnp.arange(U)[:, None], 0.0, MASK_VALUE)

    ks, vs = [], []
    for i in range(c.decoder_layers):
        lp = lm[f"layer_{i}"]
        att = lp["self_attn"]
        h_in = (_ln(lp["self_attn_layer_norm"], x)
                if c.decoder_normalize_before else x)
        q, k1, v1 = _dense_qkv(att, h_in)
        q = q.reshape(K, U, H, Dh)
        kh = k1.reshape(K, U, H, Dh)
        vh = v1.reshape(K, U, H, Dh)
        logits = jnp.einsum("kuhd,kjhd->khuj", q, kh,
                            preferred_element_type=jnp.float32) * (Dh ** -0.5)
        logits = logits + causal[None, None]
        p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("khuj,kjhd->kuhd", p, vh).reshape(K, U, D)
        h = _dense(att["out_proj"], o)
        if c.decoder_normalize_before:
            x = x + h
            hf = _dense(lp["fc2"], jax.nn.relu(
                _dense(lp["fc1"], _ln(lp["final_layer_norm"], x))))
            x = x + hf
        else:
            x = _ln(lp["self_attn_layer_norm"], x + h)
            hf = _dense(lp["fc2"], jax.nn.relu(_dense(lp["fc1"], x)))
            x = _ln(lp["final_layer_norm"], x + hf)
        # time-major caches padded to capacity
        pad = ((0, u_cap - U), (0, 0), (0, 0))
        ks.append(jnp.pad(k1.swapaxes(0, 1), pad).astype(dtype))
        vs.append(jnp.pad(v1.swapaxes(0, 1), pad).astype(dtype))

    if c.decoder_normalize_before:
        x = _ln(lm["layer_norm"], x)
    h_last = jnp.take_along_axis(
        x, (lens - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    return LMState(k=tuple(ks), v=tuple(vs), h_last=h_last)


def lm_prefill_extend(params, cfg, state: LMState, plen: jnp.ndarray,
                      tokens: jnp.ndarray, new_lens: jnp.ndarray) -> LMState:
    """Extend a prefilled LM cache by a short batch of new tokens.

    The chunk-entry prefix at inter_beam=1 is always the previous chunk's
    prefix plus the tokens it emitted (<= max_steps of them), so the
    per-chunk ``lm_prefill`` over the FULL width can instead attend the
    new tokens against [existing cache | themselves, causal] — one narrow
    batched call (the round-5 beam carry-over building block; parity with
    a from-scratch prefill is pinned by tests/test_caat_step.py).

    state: LMState with k/v [u_cap, K, D]; plen: [K] valid prefix lengths
    (incl. bos); tokens: [K, S] right-padded new tokens; new_lens: [K] in
    [0, S].  Returns the extended LMState (h_last at the last valid new
    token; rows with new_lens == 0 keep their old h_last).
    """
    c = cfg
    D = c.decoder_embed_dim
    H = c.decoder_attention_heads
    Dh = D // H
    lm = params["decoder_lm"]
    embed = params.get("embed_tokens", lm.get("embed_tokens"))
    dtype = c.compute_dtype
    K, S = tokens.shape
    u_cap = state.k[0].shape[0]

    x = embed.astype(dtype)[tokens] * (D ** 0.5)                # [K, S, D]
    table = sinusoidal_table(
        c.max_target_positions + PADDING_IDX + 1 + c.rand_pos_decoder, D)
    pos = plen[:, None] + jnp.arange(S)[None, :] + 1 + PADDING_IDX
    x = x + table[pos].astype(dtype)

    # bias parts: prefix rows < plen visible; new tokens causal
    pre_bias = jnp.where(
        jnp.arange(u_cap)[None, :] < plen[:, None], 0.0,
        MASK_VALUE)                                             # [K, u_cap]
    causal = jnp.where(
        jnp.arange(S)[None, :] <= jnp.arange(S)[:, None], 0.0, MASK_VALUE)

    # invalid rows get an OUT-OF-RANGE index and scatter in 'drop' mode:
    # reading the cache to re-write old values (the earlier formulation)
    # forced XLA to COPY the full [u_cap, K, D] cache per call — the
    # operand was both gathered (for the update values) and scattered, so
    # it could not be updated in place; with drop-mode OOB rows the
    # scatter aliases the carried buffer (87 MB/chunk saved at Base dims)
    col_idx = jnp.broadcast_to(jnp.arange(K)[:, None], (K, S))
    write = (jnp.arange(S)[None, :] < new_lens[:, None])        # [K, S]
    rows_idx = jnp.where(write, plen[:, None] + jnp.arange(S)[None, :],
                         u_cap)                                 # OOB drop

    new_k, new_v = list(state.k), list(state.v)
    for i in range(c.decoder_layers):
        lp = lm[f"layer_{i}"]
        att = lp["self_attn"]
        h_in = (_ln(lp["self_attn_layer_norm"], x)
                if c.decoder_normalize_before else x)
        q, k1, v1 = _dense_qkv(att, h_in)
        q = q.reshape(K, S, H, Dh)

        kc = state.k[i].astype(dtype).reshape(u_cap, K, H, Dh)
        vc = state.v[i].astype(dtype).reshape(u_cap, K, H, Dh)
        lg_pre = jnp.einsum("kshd,ukhd->khsu", q, kc,
                            preferred_element_type=jnp.float32) * (Dh ** -0.5)
        lg_pre = lg_pre + pre_bias[:, None, None, :]
        kh = k1.reshape(K, S, H, Dh)
        vh = v1.reshape(K, S, H, Dh)
        lg_new = jnp.einsum("kshd,kjhd->khsj", q, kh,
                            preferred_element_type=jnp.float32) * (Dh ** -0.5)
        lg_new = lg_new + causal[None, None]
        both = jnp.concatenate([lg_pre, lg_new], axis=-1)
        p = jax.nn.softmax(both, axis=-1).astype(x.dtype)
        o = (jnp.einsum("khsu,ukhd->kshd", p[..., :u_cap], vc)
             + jnp.einsum("khsj,kjhd->kshd", p[..., u_cap:], vh)
             ).reshape(K, S, D)
        h = _dense(att["out_proj"], o)
        if c.decoder_normalize_before:
            x = x + h
            hf = _dense(lp["fc2"], jax.nn.relu(
                _dense(lp["fc1"], _ln(lp["final_layer_norm"], x))))
            x = x + hf
        else:
            x = _ln(lp["self_attn_layer_norm"], x + h)
            hf = _dense(lp["fc2"], jax.nn.relu(_dense(lp["fc1"], x)))
            x = _ln(lp["final_layer_norm"], x + hf)

        # scatter the valid new rows into the time-major caches (invalid
        # rows dropped via their OOB index — no cache read, no copy)
        new_k[i] = state.k[i].at[rows_idx, col_idx].set(
            k1.astype(state.k[i].dtype), mode="drop")
        new_v[i] = state.v[i].at[rows_idx, col_idx].set(
            v1.astype(state.v[i].dtype), mode="drop")

    if c.decoder_normalize_before:
        x = _ln(lm["layer_norm"], x)
    idx = jnp.maximum(new_lens - 1, 0)[:, None, None].astype(jnp.int32)
    h_new = jnp.take_along_axis(x, idx, axis=1)[:, 0]
    h_last = jnp.where((new_lens > 0)[:, None], h_new, state.h_last)
    return LMState(k=tuple(new_k), v=tuple(new_v), h_last=h_last)


def lm_reorder(state: LMState, rows: jnp.ndarray) -> LMState:
    """Gather beam rows (the fairseq ``reorder_incremental_state``):
    rows [K] indices into the stream axis of the caches/h_last."""
    return LMState(
        k=tuple(k[:, rows] for k in state.k),
        v=tuple(v[:, rows] for v in state.v),
        h_last=state.h_last[rows])


def lm_init(params, cfg, n_streams: int, u_cap: int, bos: int | None = None,
            dtype=None) -> LMState:
    """Empty caches + one step on bos (prefix = [bos])."""
    c = cfg
    dtype = dtype or c.compute_dtype
    z = tuple(jnp.zeros((u_cap, n_streams, c.decoder_embed_dim), dtype)
              for _ in range(c.decoder_layers))
    state = LMState(k=z, v=z,
                    h_last=jnp.zeros((n_streams, c.decoder_embed_dim), dtype))
    bos_id = c.bos if bos is None else bos
    toks = jnp.full((n_streams,), bos_id, jnp.int32)
    return lm_step(params, cfg, state, toks, jnp.zeros(n_streams, jnp.int32),
                   jnp.ones(n_streams, bool))


def jointer_kv(params, cfg, x_new: jnp.ndarray):
    """Project new encoder frames to per-layer jointer K/V.

    x_new: time-major [n, N, D] -> (k, v) tuples of L_j arrays
    [n, N, D].  The reference caches exactly these in
    ExpandMultiheadAttention's incremental state
    (attention_transducer.py:667-684).  Per-layer tuples (not a stacked
    array) keep downstream cache appends in place.
    """
    ks, vs = [], []
    for i in range(cfg.jointer_layers):
        att = params["jointer"][f"layer_{i}"]["enc_attn"]
        ks.append(_dense(att["k_proj"], x_new))
        vs.append(_dense(att["v_proj"], x_new))
    return tuple(ks), tuple(vs)


def jointer_kv_append(jk, jv, k_new, v_new, t0):
    """Append per-layer new-frame K/V at cache offset ``t0`` (in place).

    Caches and new rows are time-major: the append is a
    dynamic_update_slice on the leading axis."""
    jk = tuple(jax.lax.dynamic_update_slice_in_dim(c, n, t0, axis=0)
               for c, n in zip(jk, k_new))
    jv = tuple(jax.lax.dynamic_update_slice_in_dim(c, n, t0, axis=0)
               for c, n in zip(jv, v_new))
    return jk, jv


def jointer_beam_logits(params, cfg, h_last: jnp.ndarray, jk, jv,
                        visible: jnp.ndarray) -> jnp.ndarray:
    """Beam-batched jointer step sharing per-stream encoder K/V.

    h_last: [N, B, D] LM states for B beams per stream; jk/jv: per-layer
    tuples of time-major [T_cap, N, D] (ONE copy per stream — the beams of
    a stream attend the same revealed frames, so the cache is never tiled
    per beam); visible: [N].  Returns the [N, B, V] f32 output-projection
    LOGITS (un-normalized): log-probs are logits - logsumexp, and the beam
    block defers that per-row constant to the few selected candidates
    instead of normalizing the full vocab axis every iteration
    (``jointer_step_beam`` below keeps the normalized form).
    """
    c = cfg
    D = c.jointer_embed_dim
    H = c.jointer_attention_heads
    Dh = D // H
    t_cap = jk[0].shape[0]
    N, B, _ = h_last.shape
    bias = jnp.where(jnp.arange(t_cap)[None] < visible[:, None], 0.0,
                     MASK_VALUE)                                  # [N, T]
    x = h_last
    for i in range(c.jointer_layers):
        lp = params["jointer"][f"layer_{i}"]
        att = lp["enc_attn"]
        h = _ln(lp["attn_layer_norm"], x) if c.decoder_normalize_before else x
        q = _dense(att["q_proj"], h).reshape(N, B, H, Dh)
        k = jk[i].astype(h.dtype).reshape(t_cap, N, H, Dh)
        v = jv[i].astype(h.dtype).reshape(t_cap, N, H, Dh)
        logits = jnp.einsum("nbhd,tnhd->nbht", q, k,
                            preferred_element_type=jnp.float32) * (Dh ** -0.5)
        logits = logits + bias[:, None, None, :]
        p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("nbht,tnhd->nbhd", p, v).reshape(N, B, D)
        h = _dense(att["out_proj"], o)
        x = x + h
        if not c.decoder_normalize_before:
            x = _ln(lp["attn_layer_norm"], x)
        h = _ln(lp["final_layer_norm"], x) if c.decoder_normalize_before else x
        h = jax.nn.relu(_dense(lp["fc1"], h))
        h = _dense(lp["fc2"], h)
        x = x + h
        if not c.decoder_normalize_before:
            x = _ln(lp["final_layer_norm"], x)

    if c.share_input_output_embed:
        # embed table read at the COMPUTE dtype (the astype is
        # loop-invariant -> hoisted): at bf16 configs the MXU computes
        # bf16 passes for f32 inputs anyway (default matmul precision),
        # so only the 2x HBM read of the f32 table is saved; f32 configs
        # (CPU tests) are bitwise unchanged.  Accumulation stays f32.
        logits = jnp.einsum("nbd,vd->nbv", x,
                            params["embed_tokens"].astype(c.compute_dtype),
                            preferred_element_type=jnp.float32)
    else:
        logits = jnp.einsum(
            "nbd,dv->nbv", x,
            params["out_proj"]["kernel"].astype(c.compute_dtype),
            preferred_element_type=jnp.float32)
        if "bias" in params["out_proj"]:
            logits = logits + params["out_proj"]["bias"]
    return logits


def jointer_step_beam(params, cfg, h_last: jnp.ndarray, jk, jv,
                      visible: jnp.ndarray) -> jnp.ndarray:
    """[N, B, V] log-probs (normalized ``jointer_beam_logits``) — same
    math as ``jointer_step`` batched over beams."""
    return jax.nn.log_softmax(
        jointer_beam_logits(params, cfg, h_last, jk, jv, visible), axis=-1)


def jointer_step(params, cfg, h_last: jnp.ndarray, jk, jv,
                 visible: jnp.ndarray) -> jnp.ndarray:
    """Next-symbol log-probs from cached jointer K/V.

    h_last: [N, D] LM state; jk/jv: per-layer tuples of time-major
    [T_cap, N, D]; visible: [N] number of revealed encoder frames, or a
    [N, T_cap] boolean PLANE (True = revealed) for the continuous-batching
    serving path whose slots hold scattered global rows (stream/serving.py).
    Returns [N, V]
    log-probs — bit-compatible with ``W2V2CaatModel.decode_step``
    (single-group jointer + shared-embedding projection) for both LN
    orderings.
    """
    c = cfg
    D = c.jointer_embed_dim
    H = c.jointer_attention_heads
    Dh = D // H
    t_cap = jk[0].shape[0]
    N = h_last.shape[0]
    if visible.ndim == 2:
        bias = jnp.where(visible[:, :t_cap], 0.0, MASK_VALUE)    # [N, T]
    else:
        bias = jnp.where(jnp.arange(t_cap)[None] < visible[:, None], 0.0,
                         MASK_VALUE)                             # [N, T]
    x = h_last
    for i in range(c.jointer_layers):
        lp = params["jointer"][f"layer_{i}"]
        att = lp["enc_attn"]
        h = _ln(lp["attn_layer_norm"], x) if c.decoder_normalize_before else x
        q = _dense(att["q_proj"], h).reshape(N, H, Dh)
        k = jk[i].astype(h.dtype).reshape(t_cap, N, H, Dh)
        v = jv[i].astype(h.dtype).reshape(t_cap, N, H, Dh)
        logits = jnp.einsum("nhd,tnhd->nht", q, k,
                            preferred_element_type=jnp.float32) * (Dh ** -0.5)
        logits = logits + bias[:, None, :]
        p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("nht,tnhd->nhd", p, v).reshape(N, D)
        h = _dense(att["out_proj"], o)
        x = x + h
        if not c.decoder_normalize_before:
            x = _ln(lp["attn_layer_norm"], x)
        h = _ln(lp["final_layer_norm"], x) if c.decoder_normalize_before else x
        h = jax.nn.relu(_dense(lp["fc1"], h))
        h = _dense(lp["fc2"], h)
        x = x + h
        if not c.decoder_normalize_before:
            x = _ln(lp["final_layer_norm"], x)

    if c.share_input_output_embed:
        # compute-dtype table read, f32 accumulation (see
        # jointer_beam_logits)
        logits = jnp.einsum("nd,vd->nv", x,
                            params["embed_tokens"].astype(c.compute_dtype),
                            preferred_element_type=jnp.float32)
    else:
        logits = jnp.einsum(
            "nd,dv->nv", x,
            params["out_proj"]["kernel"].astype(c.compute_dtype),
            preferred_element_type=jnp.float32)
        if "bias" in params["out_proj"]:
            logits = logits + params["out_proj"]["bias"]
    return jax.nn.log_softmax(logits, axis=-1)
