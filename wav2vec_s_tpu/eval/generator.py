"""Offline generation: seq2seq beam search + transducer offline decode.

Re-provides the capability of fairseq ``SequenceGenerator`` and rain's
``SequenceGenerator2`` family (rain/sequence_generator_w2v2.py:12-366 —
offline beam search that threads raw-audio encoder outputs through the
decode loop; used for eval-BLEU during validation and fairseq-generate).

TPU-first: fixed beam K and max length L; the decoder is recomputed over the
right-padded prefix each step (static shapes; the [B*K, U] recompute is tiny
next to the encoder), scores/finished bookkeeping in numpy on the host.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class BeamHypo:
    tokens: List[int]
    score: float


class Seq2SeqBeamGenerator:
    def __init__(self, model, params, vocab, beam_size: int = 5,
                 max_len_a: float = 0.0, max_len_b: int = 200,
                 len_penalty: float = 1.0):
        self.model = model
        self.params = params
        self.vocab = vocab
        self.beam = beam_size
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self.len_penalty = len_penalty

        @jax.jit
        def _scores(params, prev, enc, enc_pad, lens):
            logits = model.apply({"params": params}, prev, enc, enc_pad,
                                 method=type(model).decode_logits)
            k = jnp.arange(prev.shape[0])
            last = logits[k, lens - 1]
            return jax.nn.log_softmax(last, axis=-1)

        self._scores = _scores

        @jax.jit
        def _encode(params, source, padding_mask):
            return model.apply({"params": params}, source, padding_mask,
                               method=type(model).encode)

        self._encode = _encode

    def generate(self, source: np.ndarray,
                 padding_mask: Optional[np.ndarray] = None) -> List[BeamHypo]:
        """source: [1, S] waveform -> beam hypotheses sorted by score."""
        bos, eos, pad = (self.vocab.bos(), self.vocab.eos(), self.vocab.pad())
        if padding_mask is None:
            padding_mask = np.zeros(source.shape, bool)
        enc, enc_pad = self._encode(self.params, jnp.asarray(source),
                                    jnp.asarray(padding_mask))
        K = self.beam
        enc = jnp.repeat(enc, K, axis=0)
        enc_pad = jnp.repeat(enc_pad, K, axis=0)

        max_len = int(self.max_len_a * source.shape[1] + self.max_len_b)
        max_len = max(2, min(max_len, 512))
        prefixes = np.full((K, max_len + 1), pad, np.int32)
        prefixes[:, 0] = eos  # fairseq convention: prefix starts with eos
        scores = np.full(K, -np.inf)
        scores[0] = 0.0
        finished: List[BeamHypo] = []

        for step in range(1, max_len + 1):
            lens = np.full(K, step, np.int32)
            lp = np.array(self._scores(
                self.params, jnp.asarray(prefixes), enc, enc_pad,
                jnp.asarray(lens)))  # writable host copy
            lp[:, pad] = -np.inf
            if step == max_len:  # force eos at the length cap
                keep = lp[:, eos].copy()
                lp[:] = -np.inf
                lp[:, eos] = keep
            total = scores[:, None] + lp
            flat = total.reshape(-1)
            top = np.argpartition(-flat, 2 * K - 1)[:2 * K]
            top = top[np.argsort(-flat[top])]
            V = lp.shape[1]
            new_prefixes = np.full_like(prefixes, pad)
            new_scores = np.full(K, -np.inf)
            n_new = 0
            for idx in top:
                row, tok = idx // V, idx % V
                sc = float(flat[idx])
                if not np.isfinite(sc):
                    continue
                if tok == eos:
                    toks = prefixes[row, 1:step].tolist()
                    finished.append(BeamHypo(
                        toks, sc / (step ** self.len_penalty)))
                    continue
                if n_new < K:
                    new_prefixes[n_new, :step] = prefixes[row, :step]
                    new_prefixes[n_new, step] = tok
                    new_scores[n_new] = sc
                    n_new += 1
            prefixes, scores = new_prefixes, new_scores
            if len(finished) >= K and max(
                    (h.score for h in finished)) >= (
                        scores[0] / ((step + 1) ** self.len_penalty)
                        if np.isfinite(scores[0]) else -np.inf):
                break
            if not np.isfinite(scores).any():
                break

        finished.sort(key=lambda h: -h.score)
        if not finished:
            finished = [BeamHypo(prefixes[0, 1:].tolist(), float(scores[0]))]
        return finished[:K]


def transducer_offline_decode(searcher, audio: np.ndarray,
                              intra_beam: int = 5, max_steps: int = 200):
    """Offline CAAT decode = one streaming search over the whole utterance
    (the reference's offline path runs the same blockwise encoder full-
    context, rain/tasks/w2v2_s2s_task.py:400-488)."""
    state = searcher.init_state()
    state, words = searcher.search(
        state, audio, is_end=True, intra_beam=intra_beam, inter_beam=1,
        gen_beam=5.0, read_step=10 ** 9, max_steps=max_steps)
    return " ".join(words)
