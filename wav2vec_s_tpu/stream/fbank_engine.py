"""Streaming engine for the fbank CAAT family (closes SURVEY §2.3's
``OnlineSpeechModels`` / ``TransducerAgent`` rows).

The reference's fbank agents cannot re-featurize from raw audio inside
the model (fbank is a host-side transform), so ``OnlineSpeechModels``
keeps a chunked carry-over extractor: each READ appends the new samples,
converts exactly the frames whose 25 ms windows are complete, and carries
the residual samples forward (rain/simul/transducer_agent.py:170-237).
``IncrementalFbank`` is that component — pinned equal to the offline
``logmel_fbank`` for any chunking (tests/test_fbank_streaming.py).

``FbankStreamingEngine`` then mirrors ``StreamingEngine``'s
recompute-over-buckets design on the FEATURE prefix: bucketed blockwise
encode with the right-context tail trimmed while the stream is open, and
``decode_scores`` through ``FbankCaatModel.decode_step``.  It plugs into
the same ``StreamingTransducerSearcher`` + ``SpeechTransducerAgent`` +
``SimulEvaluator`` stack as the w2v2 path, so fbank WER/latency comes out
of the same eval CLI (``--features fbank`` configs).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wav2vec_s_tpu.data.batching import bucket_for

FRAME = 400          # 25 ms window @ 16 kHz
SHIFT = 160          # 10 ms shift


class IncrementalFbank:
    """Chunked log-mel extraction with sample carry-over.

    ``push(samples)`` returns the newly completed frames; the
    concatenation over any chunking equals ``logmel_fbank(full_signal)``
    exactly (same windows, same pre-emphasis including the cross-chunk
    previous-sample term).
    """

    def __init__(self):
        self.buf = np.zeros(0, np.float32)
        self.n_frames = 0

    def push(self, samples: np.ndarray) -> np.ndarray:
        self.buf = np.concatenate(
            [self.buf, np.asarray(samples, np.float32)])
        if len(self.buf) < FRAME:
            return np.zeros((0, 80), np.float32)
        total = 1 + (len(self.buf) - FRAME) // SHIFT
        if total <= self.n_frames:
            return np.zeros((0, 80), np.float32)
        feats = _fbank_aligned(self.buf, self.n_frames * SHIFT,
                               total - self.n_frames)
        self.n_frames = total
        return feats


def _fbank_aligned(wav: np.ndarray, start: int, n: int) -> np.ndarray:
    """log-mel of frames [start/SHIFT, start/SHIFT + n) of the FULL
    signal, matching ``logmel_fbank(wav)`` rows exactly."""
    pe = np.empty_like(wav)
    pe[0] = wav[0]
    pe[1:] = wav[1:] - 0.97 * wav[:-1]
    idx = (np.arange(FRAME)[None, :] + start
           + SHIFT * np.arange(n)[:, None])
    frames = pe[idx] * np.hanning(FRAME)[None, :]
    n_fft = 512
    spec = np.abs(np.fft.rfft(frames, n_fft)) ** 2
    return np.log(np.maximum(spec @ _MEL_FB.T, 1e-10)).astype(np.float32)


def _mel_fb(rate=16000, n_mels=80, n_fft=512):
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mels = np.linspace(hz2mel(20), hz2mel(rate / 2), n_mels + 2)
    bins = np.floor((n_fft + 1) * mel2hz(mels) / rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, c, hi = bins[i], bins[i + 1], bins[i + 2]
        if c > lo:
            fb[i, lo:c] = (np.arange(lo, c) - lo) / (c - lo)
        if hi > c:
            fb[i, c:hi] = (hi - np.arange(c, hi)) / (hi - c)
    return fb


_MEL_FB = _mel_fb()


class FbankStreamingEngine:
    """StreamingEngine twin over fbank features (FbankCaatModel)."""

    def __init__(self, model, params, main_context: int = 4,
                 right_context: int = 2, subsample: int = 4,
                 feature_buckets: Optional[Sequence[int]] = None,
                 token_buckets: Sequence[int] = (16, 32, 64, 128, 256),
                 max_frames: int = 6000):
        self.model = model
        self.params = params
        self.mc, self.rc = main_context, right_context
        self.subsample = subsample
        if feature_buckets is None:
            step = main_context * subsample
            feature_buckets = [step * i for i in range(1, 26)]
            v = feature_buckets[-1]
            while v < max_frames:
                v = int(v * 1.25) // step * step + step
                feature_buckets.append(v)
        self.feature_buckets = list(feature_buckets)
        self.token_buckets = list(token_buckets)
        # per-utterance carry-over extractor state; reset() is called by
        # the agent at utterance start (the prefix-shrink heuristic in
        # encode_prefix stays as a fallback — it alone misses a new
        # utterance whose first prefix is >= the previous total length)
        self._inc = IncrementalFbank()
        self._feats = np.zeros((0, 80), np.float32)

    def reset(self):
        """Clear carry-over featurizer state (call at utterance start)."""
        self._inc = IncrementalFbank()
        self._feats = np.zeros((0, 80), np.float32)

    @functools.cached_property
    def _encode(self):
        @functools.partial(jax.jit, static_argnames=("finished",))
        def _enc(params, feats, n_frames, finished):
            B, T, _ = feats.shape
            pad = (jnp.arange(T)[None, :] >= n_frames[:, None])
            enc, enc_pad = self.model.apply(
                {"params": params}, feats, pad, self.mc, self.rc, False,
                method=type(self.model).encode)
            return enc, enc_pad

        return _enc

    @functools.cached_property
    def _decode(self):
        @jax.jit
        def _dec(params, prev_tokens, token_lens, enc, enc_mask):
            return self.model.apply(
                {"params": params}, prev_tokens, token_lens, enc, enc_mask,
                method=type(self.model).decode_step)

        return _dec

    # -- carry-over featurization + encode ------------------------------
    def encode_prefix(self, audio: np.ndarray, finished: bool):
        """audio: the FULL sample prefix so far -> (enc [T_eff, D], T_eff).

        Features are extended chunked (only the new samples are
        featurized); the encode recomputes over the feature prefix at a
        bucketed length, trimming the rc look-ahead while open.
        """
        n = len(audio)
        if n < len(self._inc.buf):          # new utterance
            self._inc = IncrementalFbank()
            self._feats = np.zeros((0, 80), np.float32)
        new = self._inc.push(np.asarray(audio[len(self._inc.buf):],
                                        np.float32))
        if len(new):
            self._feats = np.concatenate([self._feats, new])
        T = len(self._feats)
        if T == 0:
            D = self.model.enc_cfg.encoder_embed_dim
            return np.zeros((0, D), np.float32), 0
        Tp = bucket_for(T, self.feature_buckets)
        buf = np.zeros((1, Tp, 80), np.float32)
        buf[0, :T] = self._feats
        enc, _ = self._encode(self.params, jnp.asarray(buf),
                              jnp.asarray([T]), finished=finished)
        enc = np.asarray(enc[0])
        t = T // self.subsample
        if not finished:
            t = max(t - self.rc, 0)
        return enc[:t], t

    def decode_scores(self, prefixes: np.ndarray, lens: np.ndarray,
                      enc: np.ndarray, visible: int) -> np.ndarray:
        K, U = prefixes.shape
        U_pad = bucket_for(U, self.token_buckets)
        toks = np.ones((K, U_pad), np.int32)
        toks[:, :U] = prefixes
        T = enc.shape[0]
        S = bucket_for(max(T, 1),
                       [b // self.subsample for b in self.feature_buckets])
        enc_buf = np.zeros((K, S, enc.shape[1]), enc.dtype)
        enc_buf[:, :T] = enc[None]
        mask = np.ones((K, S), bool)
        mask[:, :min(visible, T)] = False
        out = self._decode(self.params, jnp.asarray(toks),
                           jnp.asarray(lens.astype(np.int32)),
                           jnp.asarray(enc_buf), jnp.asarray(mask))
        return np.array(out)
