"""Jitted inference engine for the streaming agent.

Wraps the CAAT model into two bucketed, jit-cached functions:

- ``encode(prefix_audio, finished)`` — full-prefix blockwise encode with the
  right-context tail trimmed while the stream is open (reference semantics:
  OnlineModels.fwd_encoder re-encodes the whole received waveform each step
  with ``is_infer=True``, rain/simul/transducer_agent.py:138-167 +
  unidirect_w2v2_encoder.py:326-328).  Because the block-attention layout
  bounds every frame's context to its own block + rc look-ahead, the
  full-prefix re-encode produces *identical* frames to a cached incremental
  encoder (tests/test_wav2vec2_model.py::test_blockwise_streaming_causality)
  — so the TPU-native design trades the reference's mutable KV cache +
  rollback for stateless recompute over a handful of static shapes.
- ``decode_step(prev_tokens, lens, enc, enc_mask)`` — next-symbol log-probs
  for a beam of prefixes (recompute-over-cache likewise).

Audio prefixes and token prefixes are padded to geometric buckets; each
bucket compiles once and is cached by jit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wav2vec_s_tpu.data.batching import bucket_for
from wav2vec_s_tpu.models.feature_extractor import (
    conv_output_length, conv_receptive_stride)


class StreamingEngine:
    def __init__(self, model, params, main_context: int = 16,
                 right_context: int = 8,
                 audio_buckets: Optional[Sequence[int]] = None,
                 token_buckets: Sequence[int] = (16, 32, 64, 128, 256),
                 max_audio_sec: float = 60.0):
        self.model = model
        self.params = params
        self.mc, self.rc = main_context, right_context
        # frame accounting follows the model's conv stack (default: 320
        # samples/frame), not a hardcoded hop
        w2v_cfg = getattr(model, "w2v_cfg", None) or getattr(model, "cfg")
        self.conv_layers = w2v_cfg.conv_feature_layers
        _, hop = conv_receptive_stride(self.conv_layers)
        if audio_buckets is None:
            # one bucket per main-context step up to ~8s, then geometric
            step = self.mc * hop
            audio_buckets = [step * i for i in range(1, 26)]
            v = audio_buckets[-1]
            while v < max_audio_sec * 16000:
                v = int(v * 1.25) // step * step + step
                audio_buckets.append(v)
        self.audio_buckets = list(audio_buckets)
        self.token_buckets = list(token_buckets)

        @functools.partial(jax.jit, static_argnames=("finished",))
        def _encode(params, audio, n_samples, finished):
            B, S = audio.shape
            pad = (jnp.arange(S)[None, :] >= n_samples[:, None])
            enc, enc_pad = self.model.apply(
                {"params": params}, audio, pad, self.mc, self.rc, False,
                method=type(self.model).encode)
            return enc, enc_pad

        self._encode = _encode

        @jax.jit
        def _decode_step(params, prev_tokens, token_lens, enc, enc_mask):
            return self.model.apply(
                {"params": params}, prev_tokens, token_lens, enc, enc_mask,
                method=type(self.model).decode_step)

        self._decode_step = _decode_step

    # -- encoder -------------------------------------------------------
    def encode_prefix(self, audio: np.ndarray, finished: bool):
        """audio: [n] float32 prefix -> (enc [T_eff, D], T_eff).

        Trims the trailing right-context frames while not finished.
        """
        n = len(audio)
        S = bucket_for(n, self.audio_buckets)
        buf = np.zeros((1, S), np.float32)
        buf[0, :n] = audio
        enc, enc_pad = self._encode(self.params, jnp.asarray(buf),
                                    jnp.asarray([n]), finished=finished)
        enc = np.asarray(enc[0])
        t = conv_output_length(n, self.conv_layers)
        if not finished:
            t = max(t - self.rc, 0)
        return enc[:t], t

    # -- decoder -------------------------------------------------------
    def decode_scores(self, prefixes: np.ndarray, lens: np.ndarray,
                      enc: np.ndarray, visible: int) -> np.ndarray:
        """prefixes: [K, U] right-padded int32; enc: [T, D] encoded frames;
        ``visible``: number of frames revealed to the jointer.
        Returns log-probs [K, V]."""
        K, U = prefixes.shape
        U_pad = bucket_for(U, self.token_buckets)
        toks = np.ones((K, U_pad), np.int32)  # pad=1
        toks[:, :U] = prefixes
        T = enc.shape[0]
        S = bucket_for(max(T, 1), [conv_output_length(b, self.conv_layers)
                                   for b in self.audio_buckets])
        enc_buf = np.zeros((K, S, enc.shape[1]), enc.dtype)
        enc_buf[:, :T] = enc[None]
        mask = np.ones((K, S), bool)
        mask[:, :min(visible, T)] = False
        out = self._decode_step(self.params, jnp.asarray(toks),
                                jnp.asarray(lens.astype(np.int32)),
                                jnp.asarray(enc_buf), jnp.asarray(mask))
        return np.array(out)  # writable host copy (searcher mutates columns)


class EnsembleEngine:
    """Model ensemble for streaming decode (twin of rain's ``OnlineModels``,
    rain/simul/transducer_agent.py:22-167): per-model encoders, next-symbol
    distributions averaged in probability space (logsumexp - log N, the
    fairseq EnsembleModel rule).  Drop-in for ``StreamingEngine`` — the
    searcher treats the encoder state as opaque."""

    def __init__(self, engines):
        assert engines, "need at least one engine"
        self.engines = list(engines)

    def encode_prefix(self, audio, finished: bool):
        outs = [e.encode_prefix(audio, finished) for e in self.engines]
        t_eff = outs[0][1]
        assert all(o[1] == t_eff for o in outs), "encoders disagree on length"
        return [o[0] for o in outs], t_eff

    def decode_scores(self, prefixes, lens, encs, visible):
        lps = np.stack([
            e.decode_scores(prefixes, lens, enc, visible)
            for e, enc in zip(self.engines, encs)])
        m = lps.max(axis=0)
        avg = m + np.log(np.exp(lps - m).mean(axis=0))
        return avg
