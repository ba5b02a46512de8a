"""Batched multi-stream streaming BEAM decode (the quality path, batched).

Lifts the full ``FullTransducerSearcher`` semantics
(rain/simul/transducer_searcher.py:103-459) — intra-block beam, blank->eos
aliasing while open, 2x-beam finished pool with identical-path merging,
length-normalized scores, early stop, word-boundary-gated LCP emission —
into a device-batched lockstep decoder: N streams x B beams advance through
ONE jitted beam kernel per chunk, instead of the reference's one-utterance
-at-a-time host loop (SimulEval forks client processes, cli.py:126-150).

TPU-native design notes:
- beams are a static axis: every per-iteration op (scoring, pool merge,
  top-k expansion) is batched over [N, B] with masked per-stream early
  stop — no data-dependent shapes;
- the jointer never tiles encoder state per beam: ``jointer_step_beam``
  (stream/caat_step.py) attends B queries against ONE per-stream K/V cache;
- the prefix LM is recomputed at a static padded length per iteration
  (recompute-over-cache, same trade as ``W2V2CaatModel.decode_step``);
- identical-path pool merging is a vectorized equivalence-class reduce
  (pairwise token equality) instead of the host's O(B^2) python loop;
- the outer surface-form merge + LCP word emission stay on the host per
  chunk (they detokenize) — exactly the searcher's code, shared via
  ``stream/searcher.py`` module functions.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from wav2vec_s_tpu.models.feature_extractor import conv_output_length
from wav2vec_s_tpu.stream import caat_step
from wav2vec_s_tpu.stream.searcher import (
    NINF, lcp_emit, merge_surface_scores, spm_style_vocab)


def _merge_identical_batched(tokens, scores, add_reduce: bool):
    """Vectorized twin of the searcher's ``_merge_identical``
    (merge_paths, transducer_searcher.py:298-311): rows with identical
    token sequences collapse onto the first of their class (max or
    logaddexp), the rest drop to -inf.  tokens [N, P, U], scores [N, P]."""
    eq = (tokens[:, :, None, :] == tokens[:, None, :, :]).all(-1)  # [N,P,P]
    P = scores.shape[1]
    earlier = jnp.tril(jnp.ones((P, P), bool), k=-1)       # j < i
    first = ~((eq & earlier[None]).any(-1))                # no earlier equal
    class_max = jnp.max(jnp.where(eq, scores[:, None, :], NINF), -1)
    if add_reduce:
        safe_m = jnp.where(jnp.isfinite(class_max), class_max, 0.0)
        e = jnp.where(eq & jnp.isfinite(scores)[:, None, :],
                      jnp.exp(scores[:, None, :] - safe_m[..., None]), 0.0)
        merged = jnp.where(
            jnp.isfinite(class_max),
            safe_m + jnp.log(jnp.maximum(e.sum(-1), 1e-38)), NINF)
    else:
        merged = class_max
    return jnp.where(first, merged, NINF)


class BatchedBeamStreamingDecoder:
    """N-stream lockstep streaming beam search over the incremental encoder.

    Mirrors ``StreamingTransducerSearcher`` semantics chunk-for-chunk with
    ``read_step`` = one encoder step (``main_context * blocks_per_step``
    frames); equivalence is pinned by tests/test_beam_batched.py.
    """

    def __init__(self, model, params, vocab, w2v_cfg, tokenizer=None,
                 beam_size: int = 5, inter_beam: int = 1,
                 gen_beam: float = 2.0, max_steps: int = 40,
                 max_len: int = 200, bos_bias: float = 0.0,
                 len_scale: float = 1.0, len_penalty: float = 0.0,
                 eager: bool = False, merge_add: bool = False,
                 t_cap: int = 1024, blocks_per_step: int = 1):
        from wav2vec_s_tpu.stream.incremental import (
            IncrementalBlockwiseEncoder)

        self.model = model
        self.params = params
        self.vocab = vocab
        self.tokenizer = tokenizer
        self.caat = model.cfg
        self.B = beam_size
        self.inter_beam = inter_beam
        self.gen_beam = gen_beam
        self.max_steps = max_steps
        self.max_len = max_len
        self.bos_bias = bos_bias
        self.len_scale = len_scale
        self.len_penalty = len_penalty
        self.eager = eager
        self.merge_add = merge_add
        self.t_cap = t_cap
        self.mc = w2v_cfg.main_context
        self.rc = w2v_cfg.right_context
        self.conv_layers = w2v_cfg.conv_feature_layers
        self._spm_style = spm_style_vocab(vocab)
        self.U_cap = max_len + max_steps + 2
        # working-width buckets for the beam block (prefix-LM recompute
        # cost scales with the padded width; one executable per bucket)
        b = 16
        self._token_buckets = []
        while b < self.U_cap:
            self._token_buckets.append(b)
            b *= 2
        self._token_buckets.append(self.U_cap)
        self._enc_factory = lambda n: IncrementalBlockwiseEncoder(
            w2v_cfg, params["encoder"], n, t_cap=t_cap,
            blocks_per_step=blocks_per_step)
        self._enc_cache = {}         # n_streams -> encoder (jit reuse)

        caat = self.caat
        pad_id, bos_id, eos_id = vocab.pad(), vocab.bos(), vocab.eos()
        B, U_cap, V = self.B, self.U_cap, len(vocab)
        gen_b, ls, lpen = gen_beam, len_scale, len_penalty
        bias = bos_bias
        max_steps_ = max_steps

        def norm(score, length, is_end):
            lp = jnp.where(is_end, 0.0, lpen)
            ln = jnp.maximum(length, 1.0)
            return score * ln ** (-ls) - ln * lp

        def unnorm(score, length, is_end):
            lp = jnp.where(is_end, 0.0, lpen)
            ln = jnp.maximum(length, 1.0)
            return (score + ln * lp) * ln ** ls

        def beam_block(params, prefixes, nlens, scores, jk, jv, visible,
                       is_end, active):
            """One ``search_at`` (transducer_searcher.py:313-459) for all
            streams at once.

            prefixes [N, B, U_blk] right-padded; nlens [N, B] incl. bos;
            scores [N, B] unnormalized; visible/is_end/active [N].
            The working width U_blk is the host-bucketed prefix length
            (one executable per bucket).  The prefix LM runs ONCE per
            block (``lm_prefill``); each beam iteration is then an O(1)
            cached step with a beam-reorder gather (``lm_reorder`` — the
            fairseq reorder_incremental_state pattern), not a full prefix
            recompute.  Returns (pool_tokens [N, B, U_blk], unnormalized
            pool scores)."""
            N, _, U_blk = prefixes.shape
            lm0 = caat_step.lm_prefill(params, caat,
                                       prefixes.reshape(N * B, U_blk),
                                       nlens.reshape(N * B), U_blk)
            pool_t = jnp.full((N, 2 * B, U_blk), pad_id, jnp.int32)
            pool_s = jnp.full((N, 2 * B), NINF)
            lengths = nlens.astype(jnp.float32) - 1.0

            def cond(c):
                return (c[-1] < max_steps_) & ~jnp.all(c[-2])

            def body(c):
                (prefixes, nlens, scores, lengths, pool_t, pool_s, lm,
                 done, i) = c
                lp = caat_step.jointer_step_beam(
                    params, caat, lm.h_last.reshape(N, B, -1), jk, jv,
                    visible)
                lp = lp.at[..., pad_id].set(NINF)
                # blank -> eos alias while the stream is open (:345-347)
                eos_col = jnp.where(is_end[:, None], lp[..., eos_id],
                                    lp[..., bos_id] + bias)
                lp = lp.at[..., eos_id].set(eos_col)
                lp = lp.at[..., bos_id].set(NINF)
                lengths2 = lengths + 1.0

                # finish current paths with blank/eos into the pool
                fin = norm(scores + lp[..., eos_id], lengths2,
                           is_end[:, None])
                new_pt = pool_t.at[:, B:].set(prefixes)
                new_ps = pool_s.at[:, B:].set(fin)
                merged = _merge_identical_batched(new_pt, new_ps,
                                                  self.merge_add)
                order = jnp.argsort(-merged, axis=1, stable=True)
                new_ps = jnp.take_along_axis(merged, order, 1)
                new_pt = jnp.take_along_axis(new_pt, order[..., None], 1)

                # expand with real tokens: top-B of B*V normed scores
                lp = lp.at[..., eos_id].set(NINF)
                expand = scores[:, :, None] + lp
                # cap: prefixes at buffer limit may only finish
                expand = jnp.where(nlens[:, :, None] >= U_blk - 1, NINF,
                                   expand)
                normed = norm(expand, lengths2[:, :, None],
                              is_end[:, None, None])
                top_v, top_i = jax.lax.top_k(normed.reshape(N, B * V), B)
                rows = top_i // V
                toks = (top_i % V).astype(jnp.int32)
                nx_prefix = jnp.take_along_axis(prefixes, rows[..., None], 1)
                nx_nlens = jnp.take_along_axis(nlens, rows, 1)
                nx_scores = jnp.take_along_axis(expand.reshape(N, B * V),
                                                top_i, 1)
                nx_lengths = jnp.take_along_axis(lengths2, rows, 1)
                n_idx = jnp.arange(N)[:, None]
                b_idx = jnp.arange(B)[None, :]
                nx_prefix = nx_prefix.at[
                    n_idx, b_idx, jnp.minimum(nx_nlens, U_blk - 1)].set(toks)
                # cached LM advance: gather the origin beams' caches, then
                # consume the new token (frozen streams keep h_last)
                flat_rows = (n_idx * B + rows).reshape(N * B)
                lm = caat_step.lm_reorder(lm, flat_rows)
                adv = jnp.broadcast_to(~done[:, None], (N, B)).reshape(-1)
                lm = caat_step.lm_step(
                    params, caat, lm, toks.reshape(N * B),
                    jnp.minimum(nx_nlens, U_blk - 1).reshape(N * B), adv)
                nx_nlens = nx_nlens + 1

                # early stop: best finished beats best open by gen_beam
                # (:380-383)
                newly_done = new_ps[:, 0] - gen_b > top_v[:, 0]

                def sel(new, old):
                    d = done.reshape((N,) + (1,) * (new.ndim - 1))
                    return jnp.where(d, old, new)

                return (sel(nx_prefix, prefixes), sel(nx_nlens, nlens),
                        sel(nx_scores, scores), sel(nx_lengths, lengths),
                        sel(new_pt, pool_t), sel(new_ps, pool_s), lm,
                        done | newly_done, i + 1)

            done0 = ~active
            out = jax.lax.while_loop(
                cond, body, (prefixes, nlens, scores, lengths, pool_t,
                             pool_s, lm0, done0, jnp.zeros((), jnp.int32)))
            pool_t, pool_s = out[4][:, :B], out[5][:, :B]
            keep = pool_s > pool_s[:, :1] - gen_b
            pool_s = jnp.where(keep, pool_s, NINF)
            plens = (pool_t != pad_id).sum(-1).astype(jnp.float32)
            return pool_t, unnorm(pool_s, plens, is_end[:, None])

        self._beam_block = jax.jit(beam_block)

        def kv_append(params, jk, jv, out_cache, t0, n_new):
            x_new = jax.lax.dynamic_slice_in_dim(out_cache, t0, n_new, 0)
            k_new, v_new = caat_step.jointer_kv(params, caat, x_new)
            return caat_step.jointer_kv_append(jk, jv, k_new, v_new, t0)

        self._kv_append = jax.jit(kv_append, static_argnames=("n_new",))

    # -- corpus decode --------------------------------------------------
    def decode_corpus(self, wavs: List[np.ndarray],
                      return_delays: bool = True):
        """Stream a corpus in lockstep; returns (texts, delays_ms/word)."""
        vocab, caat = self.vocab, self.caat
        pad_id, bos_id = vocab.pad(), vocab.bos()
        N, B, U_cap = len(wavs), self.B, self.U_cap
        # reuse the per-width encoder: a fresh instance would recompile its
        # jitted step on every corpus call
        enc = self._enc_cache.get(N)
        if enc is None:
            enc = self._enc_cache[N] = self._enc_factory(N)
        hop, W = enc.hop, enc.window
        max_samples = max(len(w) for w in wavs)
        audio = np.zeros((N, max_samples + W), np.float32)
        for i, w in enumerate(wavs):
            audio[i, :len(w)] = w
        totals = np.asarray([len(w) for w in wavs])
        frames_i = np.asarray([conv_output_length(int(n), self.conv_layers)
                               for n in totals])
        total_frames = (max_samples - enc.rf) // hop + 1
        n_chunks = max((total_frames - self.rc) // enc.n_main, 1)
        stride = enc.n_main * hop

        estate = enc.init()
        cdtype = estate.out_cache.dtype
        jk = tuple(jnp.zeros((self.t_cap, N, caat.jointer_embed_dim),
                             cdtype) for _ in range(caat.jointer_layers))
        jv = tuple(jnp.zeros((self.t_cap, N, caat.jointer_embed_dim),
                             cdtype) for _ in range(caat.jointer_layers))

        prefixes = np.full((N, B, U_cap), pad_id, np.int32)
        prefixes[:, 0, 0] = bos_id
        nlens = np.ones((N, B), np.int32)
        scores = np.full((N, B), NINF)
        scores[:, 0] = 0.0
        out_pos = np.ones(N, np.int32)
        active = np.ones(N, bool)
        words_out = [[] for _ in range(N)]
        delays = [[] for _ in range(N)]

        for k in range(n_chunks):
            start = k * stride
            flush = k == n_chunks - 1
            t0 = int(np.asarray(estate.t_main)) if not isinstance(
                estate.t_main, int) else estate.t_main
            estate = enc.step(estate, audio[:, start:start + W], flush=flush)
            t_main = int(np.asarray(estate.t_main))
            n_new = t_main - t0
            if n_new <= 0:
                continue
            jk, jv = self._kv_append(self.params, jk, jv, estate.out_cache,
                                     t0, n_new)

            # per-stream visibility: open streams hide their trailing rc
            # frames (engine.encode_prefix semantics); a stream ends when
            # every one of its frames is committed
            is_end = t_main >= frames_i
            visible = np.where(is_end, np.minimum(t_main, frames_i),
                               np.minimum(t_main,
                                          np.maximum(frames_i - self.rc, 0)))
            run = active & (visible > 0)
            if not run.any():
                continue

            from wav2vec_s_tpu.data.batching import bucket_for
            u_blk = min(self.U_cap,
                        bucket_for(int(nlens.max()) + self.max_steps + 1,
                                   self._token_buckets))
            pool_t, pool_s = self._beam_block(
                self.params, jnp.asarray(prefixes[:, :, :u_blk]),
                jnp.asarray(nlens), jnp.asarray(scores), jk, jv,
                jnp.asarray(visible.astype(np.int32)), jnp.asarray(is_end),
                jnp.asarray(run))
            pool_t = np.asarray(pool_t)
            pool_s = np.asarray(pool_s, np.float64)

            # host per-stream: outer surface merge + inter-beam keep + LCP
            # word emission (searcher.search, :207-278)
            consumed_ms = np.minimum(start + W, totals) / 16.0
            self._host_merge_chunk(pool_t, pool_s, run, is_end, consumed_ms,
                                   prefixes, nlens, scores, out_pos, active,
                                   words_out, delays)
            if not active.any():
                break

        texts = [" ".join(w) for w in words_out]
        return (texts, delays) if return_delays else texts

    def _host_merge_chunk(self, pool_t, pool_s, run, is_end, consumed_ms,
                          prefixes, nlens, scores, out_pos, active,
                          words_out, delays):
        """Per-chunk host tail: outer surface merge + inter-beam keep + LCP
        word emission, re-seeding the beam arrays in place."""
        vocab = self.vocab
        pad_id = vocab.pad()
        for i in range(len(run)):
            if not run[i]:
                continue
            toks, sc = pool_t[i], pool_s[i]
            sc = merge_surface_scores(vocab, self.tokenizer, toks, sc,
                                      self.merge_add)
            lens = (toks != pad_id).sum(1).astype(np.float64)
            normed = self._norm_host(sc, lens, bool(is_end[i]))
            order = np.argsort(-normed, kind="stable")
            keep = [j for j in order[:self.inter_beam]
                    if normed[j] > normed[order[0]] - self.gen_beam
                    and np.isfinite(normed[j])]
            kt = toks[keep]
            ks = sc[keep]
            ws, out_pos[i] = lcp_emit(vocab, self.tokenizer,
                                      self._spm_style, self.eager, kt,
                                      int(out_pos[i]), bool(is_end[i]))
            if ws:
                words_out[i].extend(ws)
                delays[i].extend([float(consumed_ms[i])] * len(ws))
            prefixes[i] = pad_id
            nlens[i] = 1
            scores[i] = NINF
            for b, (row, s) in enumerate(zip(kt, ks)):
                prefixes[i, b, :len(row)] = row
                nlens[i, b] = int((row != pad_id).sum())
                scores[i, b] = s
            if is_end[i]:
                active[i] = False

    def _norm_host(self, score, lengths, is_end):
        lp = 0.0 if is_end else self.len_penalty
        lengths = np.maximum(lengths, 1.0)
        return score * lengths ** (-self.len_scale) - lengths * lp


class OneShotBeamDecoder(BatchedBeamStreamingDecoder):
    """Corpus-eval beam path: one-shot encode + interleaved beam blocks.

    Same chunk-for-chunk semantics as ``BatchedBeamStreamingDecoder``
    (pinned by tests/test_oneshot_decode.py) with two structural changes
    that only exist because, in corpus evaluation, all audio is available
    up front (the blockwise encoder is prefix-exact at block granularity —
    see ``OneShotCorpusDecoder``):

    - the encoder and the jointer K/V projections run ONCE for the whole
      corpus at full utterance length, so the per-chunk device work is one
      beam block instead of encoder step + K/V append + beam block;
    - streams are split into two halves decoded in alternation: while the
      device runs one half's beam block, the host does the other half's
      surface merge + LCP emission, hiding the per-chunk host tail and the
      dispatch/readback latency of the remote-device link.
    """

    #: streams per one-shot encode sub-batch (see OneShotCorpusDecoder)
    encode_batch = 32

    def decode_corpus(self, wavs: List[np.ndarray],
                      return_delays: bool = True):
        model, vocab, caat = self.model, self.vocab, self.caat
        pad_id, bos_id = vocab.pad(), vocab.bos()
        N, B, U_cap = len(wavs), self.B, self.U_cap
        enc = self._enc_cache.get(N)
        if enc is None:
            enc = self._enc_cache[N] = self._enc_factory(N)
        hop, W, rf = enc.hop, enc.window, enc.rf
        mc, rc = self.mc, self.rc
        max_samples = max(len(w) for w in wavs)
        audio = np.zeros((N, max_samples), np.float32)
        for i, w in enumerate(wavs):
            audio[i, :len(w)] = w
        totals = np.asarray([len(w) for w in wavs])
        frames_i = np.asarray([conv_output_length(int(n), self.conv_layers)
                               for n in totals])
        total_frames = (max_samples - rf) // hop + 1
        n_chunks = max((total_frames - self.rc) // enc.n_main, 1)
        stride = enc.n_main * hop
        t_frames = n_chunks * enc.n_main + rc
        n_samples = min((t_frames - 1) * hop + rf, max_samples)
        assert self.t_cap >= t_frames, (self.t_cap, t_frames)

        eb = min(self.encode_batch, N)
        while N % eb:
            eb -= 1

        if not hasattr(self, "_oneshot_cache"):
            self._oneshot_cache = {}
        key = (N, n_samples)
        enc_fn = self._oneshot_cache.get(key)
        if enc_fn is None:
            t_cap = self.t_cap

            def encode_all(params, au):
                def enc_one(a):
                    e, _ = model.apply(
                        {"params": params}, a, None, mc, rc, False,
                        method=type(model).encode)
                    return e

                encoded = jax.lax.map(
                    enc_one, au.reshape(N // eb, eb, n_samples))
                encoded = encoded.reshape(N, *encoded.shape[2:])
                enc_tm = jnp.swapaxes(encoded, 0, 1)
                enc_tm = jnp.pad(
                    enc_tm,
                    ((0, t_cap - enc_tm.shape[0]), (0, 0), (0, 0)))
                return caat_step.jointer_kv(params, caat, enc_tm)

            enc_fn = self._oneshot_cache[key] = jax.jit(encode_all)

        jk, jv = enc_fn(self.params, jnp.asarray(audio[:, :n_samples]))

        # two-half interleave: device(half A) overlaps host-merge(half B).
        # contiguous slices, NOT index arrays: the host tail mutates the
        # beam arrays through these views in place
        halves = ([slice(0, N)] if N < 2 else
                  [slice(0, N // 2), slice(N // 2, N)])
        jk_h = [tuple(k[:, h] for k in jk) for h in halves]
        jv_h = [tuple(v[:, h] for v in jv) for h in halves]

        prefixes = np.full((N, B, U_cap), pad_id, np.int32)
        prefixes[:, 0, 0] = bos_id
        nlens = np.ones((N, B), np.int32)
        scores = np.full((N, B), NINF)
        scores[:, 0] = 0.0
        out_pos = np.ones(N, np.int32)
        active = np.ones(N, bool)
        words_out = [[] for _ in range(N)]
        delays = [[] for _ in range(N)]

        from wav2vec_s_tpu.data.batching import bucket_for

        pending = None           # (half-rows, device pool, run, is_end, ms)

        def flush_pending():
            nonlocal pending
            if pending is None:
                return
            rows, pool_t, pool_s, run_h, is_end_h, ms_h = pending
            pool_t = np.asarray(pool_t)
            pool_s = np.asarray(pool_s, np.float64)
            self._host_merge_chunk(
                pool_t, pool_s, run_h, is_end_h, ms_h,
                prefixes[rows], nlens[rows], scores[rows], out_pos[rows],
                active[rows], words_out[rows], delays[rows])
            pending = None

        for k in range(n_chunks):
            t_main = (k + 1) * enc.n_main + (rc if k == n_chunks - 1 else 0)
            is_end = t_main >= frames_i
            visible = np.where(is_end, np.minimum(t_main, frames_i),
                               np.minimum(t_main,
                                          np.maximum(frames_i - rc, 0)))
            consumed_ms = np.minimum(k * stride + W, totals) / 16.0
            for h, rows in enumerate(halves):
                run_h = active[rows] & (visible[rows] > 0)
                if not run_h.any():
                    continue
                u_blk = min(U_cap, bucket_for(
                    int(nlens[rows].max()) + self.max_steps + 1,
                    self._token_buckets))
                dev = self._beam_block(
                    self.params, jnp.asarray(prefixes[rows, :, :u_blk]),
                    jnp.asarray(nlens[rows]), jnp.asarray(scores[rows]),
                    jk_h[h], jv_h[h],
                    jnp.asarray(visible[rows].astype(np.int32)),
                    jnp.asarray(is_end[rows]), jnp.asarray(run_h))
                flush_pending()      # overlaps with the dispatched block
                pending = (rows, dev[0], dev[1], run_h, is_end[rows],
                           consumed_ms[rows])
            if pending is None and not active.any():
                break
        flush_pending()

        texts = [" ".join(w) for w in words_out]
        return (texts, delays) if return_delays else texts
