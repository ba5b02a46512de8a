"""Continuous-batching streaming serving over N device slots.

The corpus decoders (stream/batched.py) are wave-synchronous: every stream
in a batch starts and ends together.  Real serving is not — streams join,
stall (audio arrives slower than the chip decodes), and finish
independently.  This module multiplexes live streams onto a fixed number of
device SLOTS that advance in lockstep, the design the TPU wants (one
compiled step, static shapes, no per-stream kernels):

- **Global cache rows, per-slot visibility.**  Every step appends the
  chunk's encoder K/V / outputs / jointer K/V at the same global row offset
  for all N slots (a leading-axis ``dynamic_update_slice`` — the layout
  rule from stream/incremental.py).  A slot's stream only *sees* the rows
  written while it was active, tracked by a boolean plane ``vis [N,
  t_cap]``; rows written during someone else's turn are masked out of its
  attention forever.  Absent/stalled slots compute garbage that is never
  marked visible — masking replaces control flow.
- **Per-slot positions.**  Sinusoidal positions come from each slot's own
  frame count, so a stream that joined at global row 400 still sees
  positions 0,1,2,… — bit-identical math to decoding it alone.
- **Slot recycling.**  A finished slot is reset in-graph by a mask: its
  prefix becomes [bos], its visibility row clears, and one masked LM step
  on bos rebuilds its ``h_last`` (writing bos K/V at row 0 is a no-op for
  every other stream — those values are position/param-deterministic).
- **Compaction.**  Global rows grow monotonically; when the capacity nears
  exhaustion the caches roll down by the minimum first-visible row across
  active slots (one jitted ``jnp.roll`` pass) — the serving analogue of
  freeing KV-cache pages.

The reference has no such runtime: SimulEval evaluates one utterance per
client process (simuleval/simuleval/cli.py:81-235).  Emission semantics
(greedy blank→advance policy, delay bookkeeping) are pinned equal to
``CachedFusedGreedyDecoder`` by tests/test_serving.py.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from wav2vec_s_tpu.stream import caat_step
from wav2vec_s_tpu.stream.incremental import (
    IncrementalBlockwiseEncoder, init_state)


@dataclasses.dataclass
class _Slot:
    stream_id: Optional[str] = None
    buf: Optional[np.ndarray] = None        # received samples
    n_buf: int = 0
    ended: bool = False
    chunk_idx: int = 0
    n_chunks: int = -1                      # known once ended
    first_row: int = 0                      # earliest visible global row
    pieces: List[str] = dataclasses.field(default_factory=list)
    delays_ms: List[float] = dataclasses.field(default_factory=list)
    emitted: int = 1                        # prefix rows consumed (bos)
    fresh: bool = True                      # needs in-graph reset


class ServingSession:
    """Continuous-batching greedy transducer serving.

    API:
      add_stream(sid) -> bool      claim a free slot (False = all busy)
      push(sid, samples, is_end)   feed audio (float32 @ 16 kHz)
      step() -> {sid: [words...]}  advance every ready slot by one chunk
      result(sid) -> (text, delays_ms)   after the stream finished
    """

    def __init__(self, model, params, vocab, w2v_cfg, n_slots: int = 16,
                 t_cap: int = 1024, blocks_per_step: int = 2,
                 max_len: int = 256, max_emit_per_chunk: int = 4):
        self.model, self.params, self.vocab = model, params, vocab
        self.n = n_slots
        self.t_cap = t_cap
        self.max_len = max_len
        self.max_emit = max_emit_per_chunk
        self.enc = IncrementalBlockwiseEncoder(
            w2v_cfg, params["encoder"], n_slots, t_cap=t_cap,
            blocks_per_step=blocks_per_step,
            proj=params.get("encoder_proj"))
        self.rc = self.enc.rc
        self.n_main = self.enc.n_main
        self.stride = self.enc.n_main * self.enc.hop
        self.window = self.enc.window
        self._rows_per_step = self.n_main + self.rc

        self.slots = [_Slot() for _ in range(n_slots)]
        self._by_id: Dict[str, int] = {}
        self._results: Dict[str, tuple] = {}

        caat = model.cfg
        w2v = self.enc.cfg
        N = n_slots
        self._estate = init_state(N, w2v.encoder_layers,
                                  w2v.encoder_embed_dim, t_cap,
                                  w2v.compute_dtype, out_dim=self.enc.out_dim)
        cdtype = self._estate.out_cache.dtype
        self._vis = jnp.zeros((N, t_cap), bool)
        self._jk = tuple(jnp.zeros((t_cap, N, caat.jointer_embed_dim),
                                   cdtype) for _ in range(caat.jointer_layers))
        self._jv = tuple(jnp.zeros((t_cap, N, caat.jointer_embed_dim),
                                   cdtype) for _ in range(caat.jointer_layers))
        self._prefixes = jnp.full((N, max_len + 1), vocab.pad(), jnp.int32)
        self._prefixes = self._prefixes.at[:, 0].set(vocab.bos())
        self._lens = jnp.ones((N,), jnp.int32)
        self._frames = jnp.zeros((N,), jnp.int32)
        self._lm = caat_step.lm_init(params, caat, N, max_len + 1,
                                     bos=vocab.bos())
        self._step_fn = jax.jit(self._make_step())
        self._compact_fn = jax.jit(self._make_compact())

    # -- device step -----------------------------------------------------
    def _make_step(self):
        caat = self.model.cfg
        vocab = self.vocab
        n_main, rc = self.n_main, self.rc
        n_new = self._rows_per_step
        max_emit, max_len = self.max_emit, self.max_len
        enc_step = self.enc.make_serving_step()
        t_cap = self.t_cap

        def step(params, estate, vis, jk, jv, lm, prefixes, lens, frames,
                 window, ready, flush, reset):
            N = prefixes.shape[0]
            blank, pad = vocab.bos(), vocab.pad()

            # in-graph slot reset (recycled slots)
            fresh_row = jnp.full((max_len + 1,), pad, jnp.int32
                                 ).at[0].set(blank)
            prefixes = jnp.where(reset[:, None], fresh_row[None], prefixes)
            lens = jnp.where(reset, 1, lens)
            frames = jnp.where(reset, 0, frames)
            vis = vis & ~reset[:, None]
            lm = caat_step.lm_step(
                params, caat, lm, jnp.full((N,), blank, jnp.int32),
                jnp.zeros((N,), jnp.int32), reset)

            t0 = estate.t_main
            estate = enc_step(params["encoder"], estate, window, frames, vis)

            # visibility: main rows where ready; the rc tail where flushing
            row_is_main = jnp.arange(n_new) < n_main
            new_plane = ready[:, None] & (row_is_main[None]
                                          | flush[:, None])   # [N, n_new]
            vis = jax.lax.dynamic_update_slice(
                vis, new_plane | jax.lax.dynamic_slice(
                    vis, (0, t0), (N, n_new)), (0, t0))

            x_new = jax.lax.dynamic_slice_in_dim(
                estate.out_cache, t0, n_new, axis=0)
            k_new, v_new = caat_step.jointer_kv(params, caat, x_new)
            jk, jv = caat_step.jointer_kv_append(jk, jv, k_new, v_new, t0)

            # greedy emission loop (CachedFusedGreedyDecoder._make_greedy
            # semantics, masked by `ready` and driven by the vis plane)
            def body(carry):
                prefixes, lens, lm, blocked, i = carry
                lp = caat_step.jointer_step(params, caat, lm.h_last, jk, jv,
                                            vis)
                lp = lp.at[:, pad].set(-jnp.inf)
                tok = jnp.argmax(lp, axis=-1).astype(jnp.int32)
                emit = (~blocked) & (tok != blank) & (lens < max_len)
                prefixes = prefixes.at[jnp.arange(N), lens].set(
                    jnp.where(emit, tok.astype(prefixes.dtype),
                              prefixes[jnp.arange(N), lens]))
                lm = caat_step.lm_step(params, caat, lm, tok, lens, emit)
                lens = lens + emit.astype(lens.dtype)
                return prefixes, lens, lm, blocked | ~emit, i + 1

            def cond(carry):
                return (carry[-1] < max_emit) & ~jnp.all(carry[-2])

            carry = (prefixes, lens, lm, ~ready, jnp.zeros((), jnp.int32))
            prefixes, lens, lm, _, _ = jax.lax.while_loop(cond, body, carry)
            frames = frames + jnp.where(ready, n_main, 0)
            return estate, vis, jk, jv, lm, prefixes, lens, frames

        return step

    def _make_compact(self):
        t_cap = self.t_cap

        def compact(estate, vis, jk, jv, shift):
            def roll_t(buf):
                return jnp.roll(buf, -shift, axis=0)

            keep = (jnp.arange(t_cap)[None]
                    < (estate.t_main - shift))            # [1, t_cap]
            vis = jnp.roll(vis, -shift, axis=1) & keep
            estate = estate.replace(
                k_cache=tuple(map(roll_t, estate.k_cache)),
                v_cache=tuple(map(roll_t, estate.v_cache)),
                out_cache=roll_t(estate.out_cache),
                t_main=estate.t_main - shift)
            jk = tuple(map(roll_t, jk))
            jv = tuple(map(roll_t, jv))
            return estate, vis, jk, jv

        return compact

    # -- host API ----------------------------------------------------------
    def add_stream(self, stream_id: str) -> bool:
        if stream_id in self._by_id:
            raise ValueError(f"stream {stream_id} already active")
        for i, s in enumerate(self.slots):
            if s.stream_id is None:
                self.slots[i] = _Slot(stream_id=stream_id,
                                      buf=np.zeros(0, np.float32),
                                      fresh=True)
                self._by_id[stream_id] = i
                return True
        return False

    def push(self, stream_id: str, samples, is_end: bool = False):
        s = self.slots[self._by_id[stream_id]]
        samples = np.asarray(samples, np.float32)
        if len(samples):
            s.buf = np.concatenate([s.buf, samples])
        s.n_buf = len(s.buf)
        if is_end:
            s.ended = True
            total_frames = max((s.n_buf - self.enc.rf) // self.enc.hop + 1,
                               1)
            s.n_chunks = max((total_frames - self.rc) // self.n_main, 1)

    def _ready(self, s: _Slot) -> bool:
        if s.stream_id is None:
            return False
        need = s.chunk_idx * self.stride + self.window
        return s.n_buf >= need or (s.ended and s.chunk_idx < s.n_chunks)

    def step(self) -> Dict[str, List[str]]:
        """Advance every ready slot by one chunk; returns new words."""
        N, W = self.n, self.window
        t_main = int(self._estate.t_main)
        if t_main + self._rows_per_step > self.t_cap:
            self._compact()
            t_main = int(self._estate.t_main)
            if t_main + self._rows_per_step > self.t_cap:
                raise RuntimeError(
                    f"t_cap={self.t_cap} exhausted: the longest active "
                    "stream exceeds the session's cache capacity")

        window = np.zeros((N, W), np.float32)
        ready = np.zeros(N, bool)
        flush = np.zeros(N, bool)
        reset = np.zeros(N, bool)
        fired = []
        for i, s in enumerate(self.slots):
            if s.stream_id is None:
                continue
            if s.fresh:
                reset[i] = True
                s.fresh = False
                s.first_row = t_main
            if self._ready(s):
                ready[i] = True
                start = s.chunk_idx * self.stride
                chunk = s.buf[start:start + W]
                window[i, :len(chunk)] = chunk
                flush[i] = s.ended and s.chunk_idx == s.n_chunks - 1
                fired.append(i)

        if not fired and not reset.any():
            return {}

        (self._estate, self._vis, self._jk, self._jv, self._lm,
         self._prefixes, self._lens, self._frames) = self._step_fn(
            self.params, self._estate, self._vis, self._jk, self._jv,
            self._lm, self._prefixes, self._lens, self._frames,
            jnp.asarray(window), jnp.asarray(ready), jnp.asarray(flush),
            jnp.asarray(reset))

        lens = np.asarray(self._lens)
        pfx = np.asarray(self._prefixes)
        out: Dict[str, List[str]] = {}
        for i in fired:
            s = self.slots[i]
            ms = (s.chunk_idx * self.stride + W) / 16.0
            new_words = []
            for u in range(s.emitted, int(lens[i])):
                tok = int(pfx[i, u])
                if tok >= self.vocab.nspecial:
                    s.pieces.append(self.vocab[tok])
                s.delays_ms.append(ms)
                new_words.append(self.vocab[tok]
                                 if tok >= self.vocab.nspecial else "")
            s.emitted = int(lens[i])
            s.chunk_idx += 1
            if new_words:
                out[s.stream_id] = [w for w in new_words if w]
            if s.ended and s.chunk_idx >= s.n_chunks:
                text = ("".join(s.pieces).replace("▁", " ").strip()
                        if s.pieces else "")
                self._results[s.stream_id] = (text, list(s.delays_ms))
                del self._by_id[s.stream_id]
                self.slots[i] = _Slot()
        return out

    def _compact(self):
        active_rows = [s.first_row for s in self.slots
                       if s.stream_id is not None and not s.fresh]
        t_main = int(self._estate.t_main)
        shift = min(active_rows) if active_rows else t_main
        if shift <= 0:
            return
        self._estate, self._vis, self._jk, self._jv = self._compact_fn(
            self._estate, self._vis, self._jk, self._jv,
            jnp.asarray(shift, jnp.int32))
        for s in self.slots:
            if s.stream_id is not None:
                s.first_row -= shift

    def drain(self) -> None:
        """Run steps until every admitted stream has finished (requires all
        of them to have been end-pushed)."""
        while self._by_id:
            if not any(self._ready(s) for s in self.slots):
                stuck = [s.stream_id for s in self.slots
                         if s.stream_id is not None]
                raise RuntimeError(
                    f"streams {stuck} are stalled (not ended and no "
                    "buffered audio)")
            self.step()

    def result(self, stream_id: str):
        return self._results[stream_id]
