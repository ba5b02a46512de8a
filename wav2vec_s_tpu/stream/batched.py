"""Batched multi-stream greedy streaming decode.

The reference agent decodes one utterance at a time (SimulEval forks client
*processes*, cli.py:126-150); on TPU the right shape is one device batch of
many concurrent streams.  This module runs N streams in lockstep through the
blockwise encoder and a greedy transducer policy:

per chunk (``step_frames`` new frames for every stream):
  1. batched full-prefix encode (one jitted call, bucketed lengths),
  2. up to ``max_emit`` greedy decode steps, each one batched over streams:
     emit argmax symbol where it is not blank/finished, else hold
     (blank advances to the next chunk) — the lax-style masked-update
     version of the per-stream emit loop.

This is the throughput path of the framework (north-star metric: streamed
audio-sec per second per chip through the *full* agent path); the beam
searcher (stream/searcher.py) remains the quality path.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from wav2vec_s_tpu.data.batching import bucket_for
from wav2vec_s_tpu.models.feature_extractor import conv_output_length


@dataclasses.dataclass
class BatchedStreamState:
    prefixes: np.ndarray       # [N, U_cap] right-padded with pad id
    lens: np.ndarray           # [N] prefix lengths (>=1, bos)
    finished: np.ndarray       # [N] bool (emitted max length or stream done)


class BatchedGreedyStreamingDecoder:
    def __init__(self, model, params, vocab, main_context=16,
                 right_context=8, max_len=200, max_emit_per_chunk=8,
                 audio_buckets=None, hop=320):
        self.model = model
        self.params = params
        self.vocab = vocab
        self.mc, self.rc = main_context, right_context
        self.max_len = max_len
        self.max_emit = max_emit_per_chunk
        self.hop = hop
        if audio_buckets is None:
            step = self.mc * self.hop
            audio_buckets = [step * i for i in range(1, 26)]
            v = audio_buckets[-1]
            while v < 60 * 16000:
                v = int(v * 1.25) // step * step + step
                audio_buckets.append(v)
        self.audio_buckets = list(audio_buckets)

        @jax.jit
        def _encode(params, audio, n_samples):
            S = audio.shape[1]
            pad = jnp.arange(S)[None, :] >= n_samples[:, None]
            return self.model.apply(
                {"params": params}, audio, pad, self.mc, self.rc, False,
                method=type(self.model).encode)

        @jax.jit
        def _greedy_block(params, prefixes, lens, finished, enc, enc_mask,
                          max_len):
            """Up to max_emit greedy emissions against the revealed frames."""
            blank = self.vocab.bos()
            pad = self.vocab.pad()

            def body(i, carry):
                prefixes, lens, finished, blocked = carry
                lp = self.model.apply(
                    {"params": params}, prefixes, lens, enc, enc_mask,
                    method=type(self.model).decode_step)
                lp = lp.at[:, pad].set(-jnp.inf)
                tok = jnp.argmax(lp, axis=-1)
                emit = (~finished) & (~blocked) & (tok != blank) \
                    & (lens < max_len)
                n = prefixes.shape[0]
                prefixes = prefixes.at[jnp.arange(n), lens].set(
                    jnp.where(emit, tok.astype(prefixes.dtype),
                              prefixes[jnp.arange(n), lens]))
                lens = lens + emit.astype(lens.dtype)
                blocked = blocked | ~emit     # blank -> wait for next chunk
                return prefixes, lens, finished, blocked

            blocked = jnp.zeros_like(finished)
            prefixes, lens, finished, _ = jax.lax.fori_loop(
                0, self.max_emit, body,
                (prefixes, lens, finished, blocked))
            return prefixes, lens

        self._encode = _encode
        self._greedy_block = _greedy_block

    def init_state(self, n_streams: int) -> BatchedStreamState:
        p = np.full((n_streams, self.max_len + 1), self.vocab.pad(), np.int32)
        p[:, 0] = self.vocab.bos()
        return BatchedStreamState(
            prefixes=p, lens=np.ones(n_streams, np.int32),
            finished=np.zeros(n_streams, bool))

    def step(self, state: BatchedStreamState, audio_prefixes: np.ndarray,
             audio_lens: np.ndarray, stream_done: np.ndarray
             ) -> BatchedStreamState:
        """Advance all streams given their audio so far.

        audio_prefixes: [N, S_max] float32 (zero-padded); audio_lens: [N]
        samples received; stream_done: [N] whether the source is exhausted.
        """
        N = audio_prefixes.shape[0]
        S = bucket_for(int(audio_lens.max()), self.audio_buckets)
        buf = audio_prefixes[:, :S]
        if buf.shape[1] < S:
            buf = np.pad(buf, ((0, 0), (0, S - buf.shape[1])))
        enc, enc_pad = self._encode(self.params, jnp.asarray(buf),
                                    jnp.asarray(audio_lens))
        # visible frames per stream: full conv output if done, minus rc else
        frames = np.asarray([conv_output_length(int(n))
                             for n in audio_lens])
        visible = np.where(stream_done, frames,
                           np.maximum(frames - self.rc, 0))
        T = enc.shape[1]
        mask = np.arange(T)[None, :] >= visible[:, None]
        prefixes, lens = self._greedy_block(
            self.params, jnp.asarray(state.prefixes),
            jnp.asarray(state.lens),
            jnp.asarray(state.finished), enc, jnp.asarray(mask),
            jnp.asarray(self.max_len, jnp.int32))
        return BatchedStreamState(
            prefixes=np.asarray(prefixes), lens=np.asarray(lens),
            finished=state.finished | stream_done)

    def decode_corpus(self, wavs: List[np.ndarray],
                      chunk_frames: Optional[int] = None):
        """Stream a corpus in lockstep; returns (texts, delays_ms per word).

        ``chunk_frames`` — new frames per policy step (default mc)."""
        N = len(wavs)
        hop = self.hop
        chunk = (chunk_frames or self.mc) * hop
        max_samples = max(len(w) for w in wavs)
        audio = np.zeros((N, max_samples), np.float32)
        for i, w in enumerate(wavs):
            audio[i, :len(w)] = w
        total = np.asarray([len(w) for w in wavs])

        state = self.init_state(N)
        delays = [[] for _ in range(N)]
        offset = self.mc * hop + self.rc * hop          # init_frames
        prev_lens = state.lens.copy()
        while True:
            cur = np.minimum(offset, total)
            done = cur >= total
            state = self.step(state, audio, cur, done)
            for i in range(N):
                new = int(state.lens[i] - prev_lens[i])
                delays[i].extend([cur[i] / 16.0] * new)
            prev_lens = state.lens.copy()
            if done.all():
                break
            offset += chunk

        texts = []
        for i in range(N):
            ids = state.prefixes[i, 1:state.lens[i]]
            pieces = [self.vocab[int(t)] for t in ids
                      if int(t) >= self.vocab.nspecial]
            texts.append("".join(pieces).replace("▁", " ").strip()
                         if pieces else "")
        return texts, delays


class IncrementalGreedyDecoder:
    """Batched greedy streaming over the O(T) incremental encoder.

    Exactly two compiled graphs serve an entire corpus (one encoder step,
    one greedy block), so per-chunk dispatch overhead is constant — this is
    the production throughput path.  Streams run in lockstep (equal chunk
    grid; shorter streams are zero-padded and stop emitting when done).
    """

    def __init__(self, model, params, vocab, w2v_cfg, max_len=200,
                 max_emit_per_chunk=8, t_cap=2048, blocks_per_step=1):
        from wav2vec_s_tpu.stream.incremental import (
            IncrementalBlockwiseEncoder)

        self.model = model
        self.params = params
        self.vocab = vocab
        self.max_len = max_len
        self.max_emit = max_emit_per_chunk
        self.mc = w2v_cfg.main_context
        self.rc = w2v_cfg.right_context
        self.t_cap = t_cap
        self.blocks_per_step = blocks_per_step
        self._enc_factory = lambda n: IncrementalBlockwiseEncoder(
            w2v_cfg, params["encoder"], n, t_cap=t_cap,
            blocks_per_step=blocks_per_step,
            proj=params.get("encoder_proj"))
        self._enc_cache = {}         # n_streams -> encoder (jit reuse)

        @jax.jit
        def _greedy(params, prefixes, lens, finished, out_cache, visible,
                    max_len):
            blank = self.vocab.bos()
            pad = self.vocab.pad()
            mask = (jnp.arange(self.t_cap)[None, :]
                    >= visible[:, None])                    # [N, T_cap]

            enc_bm = jnp.swapaxes(out_cache, 0, 1)   # time- -> batch-major

            def body(i, carry):
                prefixes, lens, blocked = carry
                lp = self.model.apply(
                    {"params": params}, prefixes, lens, enc_bm, mask,
                    method=type(self.model).decode_step)
                lp = lp.at[:, pad].set(-jnp.inf)
                tok = jnp.argmax(lp, axis=-1)
                emit = (~finished) & (~blocked) & (tok != blank) \
                    & (lens < max_len)
                n = prefixes.shape[0]
                prefixes = prefixes.at[jnp.arange(n), lens].set(
                    jnp.where(emit, tok.astype(prefixes.dtype),
                              prefixes[jnp.arange(n), lens]))
                lens = lens + emit.astype(lens.dtype)
                blocked = blocked | ~emit
                return prefixes, lens, blocked

            blocked = jnp.zeros_like(finished)
            prefixes, lens, _ = jax.lax.fori_loop(
                0, self.max_emit, body, (prefixes, lens, blocked))
            return prefixes, lens

        self._greedy = _greedy

    def decode_corpus(self, wavs: List[np.ndarray]):
        N = len(wavs)
        enc = self._enc_cache.get(N)
        if enc is None:
            enc = self._enc_cache[N] = self._enc_factory(N)
        hop, W = enc.hop, enc.window
        max_samples = max(len(w) for w in wavs)
        audio = np.zeros((N, max_samples + W), np.float32)
        for i, w in enumerate(wavs):
            audio[i, :len(w)] = w
        total_frames = (max_samples - enc.rf) // hop + 1
        n_chunks = max((total_frames - self.rc) // enc.n_main, 1)

        estate = enc.init()
        prefixes = np.full((N, self.max_len + 1), self.vocab.pad(), np.int32)
        prefixes[:, 0] = self.vocab.bos()
        prefixes = jnp.asarray(prefixes)
        lens = jnp.ones(N, jnp.int32)
        finished = jnp.zeros(N, bool)
        delays = [[] for _ in range(N)]
        prev_lens = np.ones(N, np.int32)

        # no host readback inside the loop: every chunk's work is dispatched
        # asynchronously and the device queue pipelines back-to-back (per-call
        # transport latency stops mattering); lens snapshots are device arrays
        # fetched once at the end
        lens_history = []
        consumed = []
        for k in range(n_chunks):
            start = k * enc.n_main * hop
            flush = k == n_chunks - 1
            estate = enc.step(estate, audio[:, start:start + W], flush=flush)
            visible = (estate.t_main * jnp.ones((N,), jnp.int32))
            prefixes, lens = self._greedy(
                self.params, prefixes, lens, finished, estate.out_cache,
                visible, jnp.asarray(self.max_len, jnp.int32))
            lens_history.append(lens)
            consumed.append((start + W) / 16.0)

        lens_all = np.asarray(jnp.stack(lens_history))        # [chunks, N]
        prev = np.ones(N, np.int32)
        for k in range(n_chunks):
            for i in range(N):
                delays[i].extend([consumed[k]] * int(lens_all[k, i] - prev[i]))
            prev = lens_all[k]

        texts = []
        pfx = np.asarray(prefixes)
        for i in range(N):
            ids = pfx[i, 1:int(prev[i])]
            pieces = [self.vocab[int(t)] for t in ids
                      if int(t) >= self.vocab.nspecial]
            texts.append("".join(pieces).replace("▁", " ").strip()
                         if pieces else "")
        return texts, delays


class FusedIncrementalGreedyDecoder(IncrementalGreedyDecoder):
    """One device call per corpus: the whole chunk loop runs as a
    ``lax.scan`` over pre-sliced audio windows (encoder step + greedy
    emissions per scan iteration).  Removes per-chunk transport latency
    entirely — the throughput benchmark path."""

    def decode_corpus(self, wavs: List[np.ndarray]):
        N = len(wavs)
        enc = self._enc_factory(N)
        hop, W = enc.hop, enc.window
        max_samples = max(len(w) for w in wavs)
        audio = np.zeros((N, max_samples + W), np.float32)
        for i, w in enumerate(wavs):
            audio[i, :len(w)] = w
        total_frames = (max_samples - enc.rf) // hop + 1
        n_chunks = max((total_frames - self.rc) // enc.n_main, 1)

        windows = np.stack([audio[:, k * enc.n_main * hop:
                                  k * enc.n_main * hop + W]
                            for k in range(n_chunks)])     # [K, N, W]

        if not hasattr(self, "_fused"):
            model, vocab = self.model, self.vocab
            max_emit, max_len, t_cap = (self.max_emit, self.max_len,
                                        self.t_cap)

            def greedy(params, prefixes, lens, out_cache, visible):
                blank, pad = vocab.bos(), vocab.pad()
                mask = jnp.arange(t_cap)[None, :] >= visible[:, None]

                def cond(carry):
                    prefixes, lens, blocked, i = carry
                    # early exit once every stream has emitted blank
                    return (i < max_emit) & ~jnp.all(blocked)

                enc_bm = jnp.swapaxes(out_cache, 0, 1)

                def body(carry):
                    prefixes, lens, blocked, i = carry
                    lp = model.apply(
                        {"params": params}, prefixes, lens, enc_bm, mask,
                        method=type(model).decode_step)
                    lp = lp.at[:, pad].set(-jnp.inf)
                    tok = jnp.argmax(lp, axis=-1)
                    emit = (~blocked) & (tok != blank) & (lens < max_len)
                    n = prefixes.shape[0]
                    prefixes = prefixes.at[jnp.arange(n), lens].set(
                        jnp.where(emit, tok.astype(prefixes.dtype),
                                  prefixes[jnp.arange(n), lens]))
                    lens = lens + emit.astype(lens.dtype)
                    return prefixes, lens, blocked | ~emit, i + 1

                blocked = jnp.zeros(prefixes.shape[0], bool)
                prefixes, lens, _, _ = jax.lax.while_loop(
                    cond, body,
                    (prefixes, lens, blocked, jnp.zeros((), jnp.int32)))
                return prefixes, lens

            def fused(params, estate, prefixes, lens, windows):
                def scan_body(carry, win):
                    estate, prefixes, lens = carry
                    estate = enc.step_fn(params["encoder"], estate, win)
                    visible = estate.t_main * jnp.ones(
                        (prefixes.shape[0],), jnp.int32)
                    prefixes, lens = greedy(params, prefixes, lens,
                                            estate.out_cache, visible)
                    return (estate, prefixes, lens), lens

                (estate, prefixes, lens), lens_hist = jax.lax.scan(
                    scan_body, (estate, prefixes, lens), windows[:-1])
                # final chunk with flush (commits the look-ahead frames)
                estate = enc.flush_fn(params["encoder"], estate,
                                      windows[-1])
                visible = estate.t_main * jnp.ones((prefixes.shape[0],),
                                                   jnp.int32)
                prefixes, lens = greedy(params, prefixes, lens,
                                        estate.out_cache, visible)
                lens_hist = jnp.concatenate([lens_hist, lens[None]], 0)
                return prefixes, lens, lens_hist

            self._fused = jax.jit(fused, donate_argnums=(1, 2, 3))

        estate = enc.init()
        prefixes = np.full((N, self.max_len + 1), self.vocab.pad(), np.int32)
        prefixes[:, 0] = self.vocab.bos()
        prefixes, lens, lens_hist = self._fused(
            self.params, estate, jnp.asarray(prefixes),
            jnp.ones(N, jnp.int32), jnp.asarray(windows))

        lens_all = np.asarray(lens_hist)
        delays = [[] for _ in range(N)]
        prev = np.ones(N, np.int32)
        for k in range(n_chunks):
            ms = (k * enc.n_main * enc.hop + W) / 16.0
            for i in range(N):
                delays[i].extend([ms] * int(lens_all[k, i] - prev[i]))
            prev = lens_all[k]

        texts = []
        pfx = np.asarray(prefixes)
        for i in range(N):
            ids = pfx[i, 1:int(prev[i])]
            pieces = [self.vocab[int(t)] for t in ids
                      if int(t) >= self.vocab.nspecial]
            texts.append("".join(pieces).replace("▁", " ").strip()
                         if pieces else "")
        return texts, delays


class CachedFusedGreedyDecoder(FusedIncrementalGreedyDecoder):
    """Fused scan + incremental jointer K/V *and* LM K/V caches.

    Every cache the reference keeps in incremental state has a
    fixed-capacity twin here: the jointer's encoder K/V projections
    (ExpandMultiheadAttention, attention_transducer.py:667-684) append once
    per chunk, and the IsolatedDecoder's per-layer self-attention K/V
    (fairseq ``prev_key/prev_value``) append once per *emission*, so a
    greedy step is O(1) — one-token LM step + one-query jointer pass —
    instead of a full LM recompute over the padded prefix.  The step math
    lives in stream/caat_step.py and is equivalence-pinned to
    ``W2V2CaatModel.decode_step`` for both LN orderings.
    """

    #: host->device wire format for the audio.  "float32" ships raw floats;
    #: "int16" ships 16-bit PCM (what the SimulEval server actually sends —
    #: scorer/instance.py serves int16 samples; the reference agent
    #: normalizes by /32768, rain transducer_searcher.py:31-80) and converts
    #: on device, halving transfer bytes over the host link.
    transfer_dtype = "float32"

    def stage(self, wavs: List[np.ndarray]):
        """Assemble + start the async host->device transfer of a corpus.

        Returns an opaque handle for ``decode_corpus``.  The transfer
        proceeds while the device is busy with a previous corpus, so a
        caller that stages batch k+1 before blocking on batch k hides the
        host-link latency entirely (the link is the slowest leg of the
        remote-device path: ~500 ms for 128x10 s of int16 audio)."""
        N = len(wavs)
        enc = self._enc_cache.get(N)
        if enc is None:
            enc = self._enc_cache[N] = self._enc_factory(N)
        hop, W = enc.hop, enc.window
        max_samples = max(len(w) for w in wavs)
        int16 = self.transfer_dtype == "int16"
        audio = np.zeros((N, max_samples + W),
                         np.int16 if int16 else np.float32)
        for i, w in enumerate(wavs):
            if int16 and w.dtype != np.int16:
                audio[i, :len(w)] = np.clip(w * 32768.0, -32768, 32767)
            else:
                audio[i, :len(w)] = w
        return N, max_samples, jax.device_put(audio)

    #: emission-loop lowering: "while" runs a lax.while_loop with early
    #: exit once every stream has emitted blank; "unroll" lays the
    #: max_emit iterations out straight-line with masked updates — same
    #: emissions (blocked streams never write; equivalence test-pinned).
    #: MEASURED on v5e (ds2, random weights, worst case for early exit):
    #: unroll is ~25-45% SLOWER (oneshot 664 vs ~900, cached 477 vs 879
    #: audio-s/s) — the 4x-duplicated loop body bloats the scan executable
    #: and the while op's profiled self-time is scheduling, not removable
    #: overhead.  Kept for future revisit; default "while".
    emit_loop = "while"

    def _make_greedy(self):
        """Greedy emission loop over cached jointer K/V + slot LM state.

        Returns greedy(params, prefixes, lens, lm, jk, jv, visible) — shared
        by the incremental fused scan and the one-shot corpus decoder."""
        from wav2vec_s_tpu.stream import caat_step

        vocab, caat = self.vocab, self.model.cfg
        max_emit, max_len = self.max_emit, self.max_len
        unroll = self.emit_loop == "unroll"

        def greedy(params, prefixes, lens, lm, jk, jv, visible):
            blank, pad = vocab.bos(), vocab.pad()

            def body(carry):
                prefixes, lens, lm, blocked, i = carry
                lp = caat_step.jointer_step(params, caat, lm.h_last, jk, jv,
                                            visible)
                lp = lp.at[:, pad].set(-jnp.inf)
                tok = jnp.argmax(lp, axis=-1).astype(jnp.int32)
                emit = (~blocked) & (tok != blank) & (lens < max_len)
                n = prefixes.shape[0]
                prefixes = prefixes.at[jnp.arange(n), lens].set(
                    jnp.where(emit, tok.astype(prefixes.dtype),
                              prefixes[jnp.arange(n), lens]))
                lm = caat_step.lm_slot_step(params, caat, lm, tok, lens,
                                            emit)
                lens = lens + emit.astype(lens.dtype)
                return prefixes, lens, lm, blocked | ~emit, i + 1

            blocked = jnp.zeros(prefixes.shape[0], bool)
            carry = (prefixes, lens, lm, blocked, jnp.zeros((), jnp.int32))
            if unroll:
                for _ in range(max_emit):
                    carry = body(carry)
            else:
                def cond(carry):
                    # early exit once every stream has emitted blank
                    return (carry[-1] < max_emit) & ~jnp.all(carry[-2])

                carry = jax.lax.while_loop(cond, body, carry)
            prefixes, lens, lm, _, _ = carry
            return prefixes, lens, lm

        return greedy

    def _texts_and_delays(self, prefixes, lens_hist, n_chunks, stride, W, N):
        """Shared tail: per-chunk delay bookkeeping + surface assembly."""
        vocab = self.vocab
        lens_all = np.asarray(lens_hist)
        delays = [[] for _ in range(N)]
        prev = np.ones(N, np.int32)
        for k in range(n_chunks):
            ms = (k * stride + W) / 16.0
            for i in range(N):
                delays[i].extend([ms] * int(lens_all[k, i] - prev[i]))
            prev = lens_all[k]

        texts = []
        pfx = np.asarray(prefixes)
        for i in range(N):
            ids = pfx[i, 1:int(prev[i])]
            pieces = [vocab[int(t)] for t in ids
                      if int(t) >= vocab.nspecial]
            texts.append("".join(pieces).replace("▁", " ").strip()
                         if pieces else "")
        return texts, delays

    def decode_corpus(self, wavs):
        from wav2vec_s_tpu.stream import caat_step

        if isinstance(wavs, tuple) and len(wavs) == 3:
            N, max_samples, audio = wavs          # pre-staged handle
        else:
            N, max_samples, audio = self.stage(wavs)
        enc = self._enc_cache[N]
        hop, W = enc.hop, enc.window
        int16 = self.transfer_dtype == "int16"
        total_frames = (max_samples - enc.rf) // hop + 1
        n_chunks = max((total_frames - self.rc) // enc.n_main, 1)
        stride = enc.n_main * hop
        # LM cache slots: bos + one per greedy iteration the chunk loop can
        # possibly run (typically far below max_len)
        n_slots = -(-(n_chunks * self.max_emit + 1) // 8) * 8

        model, vocab = self.model, self.vocab
        caat = model.cfg
        max_len = self.max_len
        t_cap = self.t_cap
        rc = self.rc

        def window_at(audio_dev, start):
            win = jax.lax.dynamic_slice(audio_dev, (0, start), (N, W))
            if int16:
                win = win.astype(jnp.float32) / 32768.0
            return win

        from wav2vec_s_tpu.stream.incremental import init_state

        greedy = self._make_greedy()

        def fused(params, audio_dev):
            # every piece of decode state is created ON DEVICE inside the
            # jit: shipping ~30 separate 100 MB zero buffers from the host
            # (one RPC each over the remote-device transport) left the chip
            # idle ~35% of the corpus wall-clock
            w2v = enc.cfg
            estate = init_state(N, w2v.encoder_layers, w2v.encoder_embed_dim,
                                t_cap, w2v.compute_dtype,
                                out_dim=enc.out_dim)
            cdtype = estate.out_cache.dtype
            jk = tuple(jnp.zeros((t_cap, N, caat.jointer_embed_dim), cdtype)
                       for _ in range(caat.jointer_layers))
            jv = tuple(jnp.zeros((t_cap, N, caat.jointer_embed_dim), cdtype)
                       for _ in range(caat.jointer_layers))
            prefixes = jnp.full((N, max_len + 1), vocab.pad(), jnp.int32)
            prefixes = prefixes.at[:, 0].set(vocab.bos())
            lens = jnp.ones((N,), jnp.int32)
            lm = caat_step.lm_slot_init(params, caat, N, n_slots)

            # segment the chunk loop by a STATIC cache capacity: early
            # chunks read only a prefix of the encoder/jointer K/V buffers
            # (the full-capacity reads were the scan's top HBM cost).  One
            # scan (and one encoder-step variant) per capacity bucket;
            # seg=256 bounds how many encoder bodies get compiled.
            seg = 256
            n_main = enc.n_main

            def cap_of(v):
                return min(-(-v // seg) * seg, t_cap)

            def chunk_step(carry, start, step_fn, cap, n_new):
                estate, jk, jv, lm, prefixes, lens = carry
                t0 = estate.t_main
                estate = step_fn(params["encoder"], estate,
                                 window_at(audio_dev, start))
                x_new = jax.lax.dynamic_slice_in_dim(
                    estate.out_cache, t0, n_new, axis=0)
                k_new, v_new = caat_step.jointer_kv(params, caat, x_new)
                jk, jv = caat_step.jointer_kv_append(jk, jv, k_new, v_new,
                                                     t0)
                visible = estate.t_main * jnp.ones((prefixes.shape[0],),
                                                   jnp.int32)
                prefixes, lens, lm = greedy(
                    params, prefixes, lens, lm,
                    tuple(k[:cap] for k in jk), tuple(v[:cap] for v in jv),
                    visible)
                return (estate, jk, jv, lm, prefixes, lens), lens

            carry = (estate, jk, jv, lm, prefixes, lens)
            hists = []
            k0 = 0
            while k0 < n_chunks - 1:
                cap = cap_of((k0 + 1) * n_main)
                k1 = k0
                while k1 < n_chunks - 1 and cap_of((k1 + 1) * n_main) == cap:
                    k1 += 1
                step_c = enc.step_fn_cap(min(cap, t_cap))

                def scan_body(carry, start, step_c=step_c, cap=cap):
                    return chunk_step(carry, start, step_c, cap, n_main)

                starts = jnp.arange(k0, k1, dtype=jnp.int32) * stride
                carry, h = jax.lax.scan(scan_body, carry, starts)
                hists.append(h)
                k0 = k1
            # final chunk: flush commits n_main + rc frames
            cap_f = cap_of(n_chunks * n_main + rc)
            carry, h = chunk_step(
                carry, jnp.asarray((n_chunks - 1) * stride, jnp.int32),
                enc.step_fn_cap(cap_f, flush=True), cap_f, n_main + rc)
            estate, jk, jv, lm, prefixes, lens = carry
            hists.append(h[None])
            lens_hist = jnp.concatenate(hists, 0)
            return prefixes, lens, lens_hist

        # all decode state (encoder KV caches, jointer K/V, LM caches,
        # prefixes) lives inside the jit as scan-carry temporaries: XLA
        # updates them in place, nothing is shipped from the host, and
        # the old donated-argument dance disappears.  One executable per
        # (stream count, chunk count) pair.
        if not hasattr(self, "_fused_cache"):
            self._fused_cache = {}
        key = (N, n_chunks)
        fn = self._fused_cache.get(key)
        if fn is None:
            fn = self._fused_cache[key] = jax.jit(fused)

        prefixes, lens, lens_hist = fn(self.params, audio)
        return self._texts_and_delays(prefixes, lens_hist, n_chunks, stride,
                                      W, N)


class OneShotCorpusDecoder(CachedFusedGreedyDecoder):
    """Corpus-eval fast path: one-shot blockwise encode + fused decision scan.

    In the corpus-evaluation setting (the reference's SimulEval flow,
    simuleval/cli.py — every utterance is on disk before decoding starts)
    the streaming policy's emissions depend on the encoder only through its
    PER-FRAME outputs, and the blockwise attention mask makes those outputs
    prefix-exact at block granularity: the incremental encoder commits,
    chunk by chunk, exactly the frames one full-utterance blockwise encode
    produces (pinned by tests/test_incremental.py).  So this decoder runs
    the heavy encoder ONCE at full utterance length — large MXU-shaped
    matmuls, optional flash-attention mask — projects the jointer K/V for
    every frame in one shot, and replays the chunk-by-chunk greedy decision
    loop against a static visibility schedule.  Texts and delays are
    IDENTICAL to ``CachedFusedGreedyDecoder`` (tests/test_oneshot_decode.py)
    at a fraction of the device time; the incremental decoders remain the
    serving path for audio that genuinely arrives in real time.
    """

    #: streams encoded per sub-batch inside the fused call (lax.map): the
    #: one-shot conv front-end's first layer materializes [B, S/5, 512]
    #: activations — sub-batching keeps that peak bounded so the stream
    #: batch N can grow far past what a monolithic encode would allow.
    encode_batch = 32

    def decode_corpus(self, wavs):
        from wav2vec_s_tpu.stream import caat_step

        if isinstance(wavs, tuple) and len(wavs) == 3:
            N, max_samples, audio = wavs          # pre-staged handle
        else:
            N, max_samples, audio = self.stage(wavs)
        enc = self._enc_cache[N]
        hop, W, rf = enc.hop, enc.window, enc.rf
        int16 = self.transfer_dtype == "int16"
        total_frames = (max_samples - rf) // hop + 1
        n_chunks = max((total_frames - self.rc) // enc.n_main, 1)
        n_main = enc.n_main
        stride = n_main * hop
        # frames the policy ever sees (flush commits the final look-ahead)
        t_frames = n_chunks * n_main + self.rc
        n_samples = (t_frames - 1) * hop + rf
        n_slots = -(-(n_chunks * self.max_emit + 1) // 8) * 8
        t_cap = self.t_cap
        assert t_cap >= t_frames, (t_cap, t_frames)

        model, vocab = self.model, self.vocab
        caat = model.cfg
        mc, rc = self.mc, self.rc
        max_len = self.max_len
        greedy = self._make_greedy()

        eb = min(self.encode_batch, N)
        while N % eb:
            eb -= 1

        def fused(params, audio_dev):
            au = jax.lax.dynamic_slice(audio_dev, (0, 0), (N, n_samples))
            if int16:
                au = au.astype(jnp.float32) / 32768.0

            def enc_one(a):
                e, _ = model.apply(
                    {"params": params}, a, None, mc, rc, False,
                    method=type(model).encode)
                return e

            encoded = jax.lax.map(
                enc_one, au.reshape(N // eb, eb, n_samples))
            encoded = encoded.reshape(N, *encoded.shape[2:])
            enc_tm = jnp.swapaxes(encoded, 0, 1)        # [t_frames, N, D]
            enc_tm = jnp.pad(
                enc_tm, ((0, t_cap - enc_tm.shape[0]), (0, 0), (0, 0)))
            jk, jv = caat_step.jointer_kv(params, caat, enc_tm)

            prefixes = jnp.full((N, max_len + 1), vocab.pad(), jnp.int32)
            prefixes = prefixes.at[:, 0].set(vocab.bos())
            lens = jnp.ones((N,), jnp.int32)
            lm = caat_step.lm_slot_init(params, caat, N, n_slots)

            # visibility schedule: chunk k reveals (k+1)*n_main frames; the
            # final chunk also reveals the flushed look-ahead
            vis = [(k + 1) * n_main + (rc if k == n_chunks - 1 else 0)
                   for k in range(n_chunks)]

            # segment chunks by a STATICALLY-sliced jointer-cache capacity:
            # early chunks see few frames, so reading the full [t_cap] K/V
            # per greedy step wastes ~2x HBM on masked rows (profiled as
            # the loop's top dots).  One scan per capacity bucket.
            seg = 128
            hists = []

            def cap_of(v):
                return min(-(-v // seg) * seg, t_cap)

            k0 = 0
            while k0 < n_chunks:
                cap = cap_of(vis[k0])
                k1 = k0
                while k1 < n_chunks and cap_of(vis[k1]) == cap:
                    k1 += 1
                jk_c = tuple(k[:cap] for k in jk)
                jv_c = tuple(v[:cap] for v in jv)

                def scan_body(carry, visible, jk_c=jk_c, jv_c=jv_c):
                    lm, prefixes, lens = carry
                    prefixes, lens, lm = greedy(
                        params, prefixes, lens, lm, jk_c, jv_c,
                        visible * jnp.ones((N,), jnp.int32))
                    return (lm, prefixes, lens), lens

                (lm, prefixes, lens), h = jax.lax.scan(
                    scan_body, (lm, prefixes, lens),
                    jnp.asarray(vis[k0:k1], jnp.int32))
                hists.append(h)
                k0 = k1
            lens_hist = jnp.concatenate(hists, axis=0)
            return prefixes, lens, lens_hist

        if not hasattr(self, "_fused_cache"):
            self._fused_cache = {}
        key = (N, n_chunks)
        fn = self._fused_cache.get(key)
        if fn is None:
            fn = self._fused_cache[key] = jax.jit(fused)

        prefixes, lens, lens_hist = fn(self.params, audio)
        return self._texts_and_delays(prefixes, lens_hist, n_chunks, stride,
                                      W, N)
