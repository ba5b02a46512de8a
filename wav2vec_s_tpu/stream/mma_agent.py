"""Streaming READ/WRITE agent for the MMA baseline.

Behavioral twin of ``MMAAgent``/``MMASearcher`` (rain/simul/mma_agent.py):
READ until ``init_frames`` of audio arrive, then on every policy step run
the monotonic decoder over the revealed frames; it emits greedy tokens
while the hard monotonic heads can stop within the revealed source
(``outputs.action`` != 0 in the reference) and asks for more source
otherwise.  eos is banned while the stream is open (mma_agent.py:63-66,
unless ``stop_early``); words are released through the same word-boundary
gate as the transducer agents.

TPU-native: the decoder is recomputed per emission at static bucketed
shapes through one jitted ``hard_decode_step`` (recompute replaces the
reference's fairseq incremental-state surgery); the pointer walk is
deterministic, so recompute agrees with carried state by construction.
Drop-in for ``SimulEvaluator`` (push/pop_word/finished).
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from wav2vec_s_tpu.data.batching import bucket_for
from wav2vec_s_tpu.models.feature_extractor import (
    conv_output_length, conv_receptive_stride)
from wav2vec_s_tpu.stream.engine import StreamingEngine
from wav2vec_s_tpu.stream.searcher import lcp_emit, spm_style_vocab


class MMAStreamingAgent:
    def __init__(self, model, params, vocab, tokenizer=None,
                 main_context: int = 16, right_context: int = 8,
                 step_read_blocks: int = 1, eager: bool = False,
                 stop_early: bool = False, max_len: int = 100,
                 max_emit_per_step: int = 20, audio_buckets=None,
                 token_buckets=(8, 16, 32, 64, 128)):
        self.model = model
        self.params = params
        self.vocab = vocab
        self.tokenizer = tokenizer
        self.mc, self.rc = main_context, right_context
        self.step_read_blocks = step_read_blocks
        self.eager = eager
        self.stop_early = stop_early
        self.max_len = max_len
        self.max_emit = max_emit_per_step
        self._spm_style = spm_style_vocab(vocab)
        self.token_buckets = list(token_buckets)
        w2v_cfg = model.w2v_cfg
        _, self.hop = conv_receptive_stride(w2v_cfg.conv_feature_layers)
        self.conv_layers = w2v_cfg.conv_feature_layers
        self.engine = StreamingEngine(model, params, main_context,
                                      right_context,
                                      audio_buckets=audio_buckets,
                                      token_buckets=token_buckets)

        @jax.jit
        def _decode(params, prev, lens, enc, enc_pad, visible, is_end):
            return self.model.apply(
                {"params": params}, prev, lens, enc, enc_pad, visible,
                is_end, method=type(self.model).hard_decode_step)

        self._decode = _decode
        self.reset()

    def reset(self):
        self.samples = []
        self.tokens = [self.vocab.eos()]   # fairseq decoding starts at eos
        self.out_pos = 1
        self.processed_frames = 0
        self.hypo_queue: deque = deque()
        self.finished = False
        self._decode_done = False

    @property
    def init_frames(self):
        return self.mc + self.rc

    @property
    def step_frames(self):
        return self.mc

    def push(self, samples: np.ndarray, is_end: bool):
        self.samples.extend(np.asarray(samples, np.float32).tolist())
        current_frames = len(self.samples) // self.hop
        if self.processed_frames == 0:
            fire = current_frames >= self.init_frames
        else:
            step = self.step_frames * self.step_read_blocks
            fire = (current_frames - self.processed_frames) >= step
        if (is_end or fire) and not self._decode_done:
            self._infer(is_end)
            self.processed_frames = current_frames
        if is_end:
            self.finished = True

    def _score(self, enc: np.ndarray, visible: int, is_end: bool):
        U = len(self.tokens)
        U_pad = bucket_for(U, self.token_buckets)
        prev = np.ones((1, U_pad), np.int32)      # pad = 1
        prev[0, :U] = self.tokens
        T = enc.shape[0]
        S = bucket_for(max(T, 1),
                       [conv_output_length(b, self.conv_layers)
                        for b in self.engine.audio_buckets])
        enc_buf = np.zeros((1, S, enc.shape[1]), enc.dtype)
        enc_buf[0, :T] = enc
        pad = np.ones((1, S), bool)
        pad[0, :T] = False
        lp, need_more = self._decode(
            self.params, jnp.asarray(prev), jnp.asarray([U], jnp.int32),
            jnp.asarray(enc_buf), jnp.asarray(pad),
            jnp.asarray([visible], jnp.int32),
            jnp.asarray([is_end]))
        return np.array(lp[0]), bool(need_more[0])  # writable host copy

    def _infer(self, is_end: bool):
        audio = np.asarray(self.samples, np.float32)
        enc, t_eff = self.engine.encode_prefix(audio, is_end)
        if t_eff <= 0:
            return
        eos = self.vocab.eos()
        for _ in range(self.max_emit):
            logits, need_more = self._score(enc, t_eff, is_end)
            if need_more and not is_end:
                break                                  # READ
            if not self.stop_early and not is_end:
                logits[eos] = -1e10                    # mma_agent.py:63-66
            logits[self.vocab.pad()] = -1e10
            tok = int(logits.argmax())
            self.tokens.append(tok)
            if tok == eos or len(self.tokens) - 1 >= self.max_len:
                self._decode_done = True
                break

        toks = [t for t in self.tokens[1:] if t != eos]   # drop lead eos
        row = np.asarray([[self.vocab.eos()] + toks], np.int32)
        words, self.out_pos = lcp_emit(
            self.vocab, self.tokenizer, self._spm_style, self.eager, row,
            self.out_pos, is_end or self._decode_done)
        self.hypo_queue.extend(words)

    def pop_word(self) -> Optional[str]:
        return self.hypo_queue.popleft() if self.hypo_queue else None
