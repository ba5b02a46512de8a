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


class TwoStageJointGenerator:
    """Two-stage joint beam decode — twin of ``StageGenerator``
    (rain/stage_generator.py:14-563, vestigial in the reference: no rain
    model implements its decode1/decode2 contract, no task builds it).

    Stage 1 beam-decodes ASR transcripts (len_penalty 1).  Stage 2
    beam-decodes the translation with the beam ranging *jointly* over
    (asr hypothesis, mt prefix): stage-1 cumulative scores enter as the
    initial beam scores (``prev_scores``, :467-472) and final scores
    normalize by the combined (asr + mt) length ** 2 (the reference's
    ``len_penalty = 2`` stage schedule, :478/:489).  ``asr_1best``
    restricts stage 2 to the best transcript (:487-489).

    Model-agnostic: ``asr_generate(source, padding_mask) -> [BeamHypo]``
    (scores length-normalized, best first) and ``mt_score_fn(asr_tokens
    [K, U_s], prev_mt [K, U], lens [K]) -> log-probs [K, V]``.
    """

    def __init__(self, asr_generate, mt_score_fn, vocab, beam_size: int = 5,
                 len_penalty_2: float = 2.0, max_len: int = 200,
                 asr_1best: bool = False):
        self.asr_generate = asr_generate
        self.mt_score_fn = mt_score_fn
        self.vocab = vocab
        self.beam = beam_size
        self.len_penalty_2 = len_penalty_2
        self.max_len = max_len
        self.asr_1best = asr_1best

    def generate(self, source, padding_mask=None):
        eos, pad = self.vocab.eos(), self.vocab.pad()
        asr_hypos = self.asr_generate(source, padding_mask)[:self.beam]
        if self.asr_1best:
            asr_hypos = asr_hypos[:1]
        K = len(asr_hypos)
        U_s = max(max(len(h.tokens) for h in asr_hypos), 1)
        asr_tokens = np.full((K, U_s), pad, np.int32)
        asr_lens = np.zeros(K, np.float64)
        prev_scores = np.zeros(K, np.float64)
        for i, h in enumerate(asr_hypos):
            toks = list(h.tokens)
            asr_tokens[i, :len(toks)] = toks
            asr_lens[i] = len(toks)
            # de-normalize: BeamHypo scores are length-normalized (lp = 1)
            prev_scores[i] = h.score * max(len(toks), 1)

        # stage-2 beam: slots = (asr hypo, mt prefix); start one beam per
        # transcript with its carried cumulative score
        B = self.beam
        prefixes = np.full((K, self.max_len + 1), pad, np.int32)
        prefixes[:, 0] = eos                    # fairseq decoding starts at eos
        slots = np.arange(K)
        scores = prev_scores.copy()
        lens = np.ones(K, np.int32)
        finished = []

        for step in range(self.max_len):
            lp = np.asarray(self.mt_score_fn(
                asr_tokens[slots], prefixes, lens), np.float64)   # [Kb, V]
            lp[:, pad] = -np.inf
            cum = scores[:, None] + lp
            # finalize eos extensions (joint normalization over both stages)
            total_len = asr_lens[slots] + lens
            fin_scores = cum[:, eos] / np.maximum(
                total_len, 1.0) ** self.len_penalty_2
            for r in np.argsort(-fin_scores)[:B]:
                if np.isfinite(fin_scores[r]):
                    finished.append({
                        "mt_tokens": prefixes[r, 1:lens[r]].tolist(),
                        "score": float(fin_scores[r]),
                        "asr_tokens": asr_hypos[slots[r]].tokens,
                        "asr_score": float(asr_hypos[slots[r]].score),
                    })
            cum[:, eos] = -np.inf
            flat = cum.reshape(-1)
            V = lp.shape[1]
            k = min(B, np.isfinite(flat).sum())
            if k == 0:
                break
            top = np.argpartition(-flat, k - 1)[:k]
            top = top[np.argsort(-flat[top])]
            rows, toks = top // V, top % V
            new_prefixes = prefixes[rows].copy()
            new_prefixes[np.arange(k), lens[rows]] = toks
            prefixes = new_prefixes
            scores = flat[top]
            slots = slots[rows]
            lens = lens[rows] + 1
            if finished:
                best_fin = max(f["score"] for f in finished)
                best_open = scores[0] / np.maximum(
                    asr_lens[slots[0]] + lens[0], 1.0) ** self.len_penalty_2
                if best_fin >= best_open and len(finished) >= B:
                    break

        finished.sort(key=lambda f: -f["score"])
        # dedup identical (asr, mt) pairs, keep best
        seen, out = set(), []
        for f in finished:
            key = (tuple(f["asr_tokens"]), tuple(f["mt_tokens"]))
            if key not in seen:
                seen.add(key)
                out.append(f)
        return out[:self.beam]


def make_offline_greedy_decoder(model, vocab, main_context=None,
                                right_context=None, max_len: int = 200):
    """Jitted batched offline greedy transducer decode (validation BLEU).

    One compiled graph: full-context blockwise encode + a while_loop of
    cached-prefix greedy emissions (the in-graph twin of the per-utterance
    generation the reference runs during validation,
    rain/tasks/w2v2_s2s_task.py:199-236).  Returns (prefixes, lens).
    """
    import jax
    import jax.numpy as jnp

    blank, pad = vocab.bos(), vocab.pad()

    @jax.jit
    def decode(params, source, padding_mask):
        enc, enc_pad = model.apply(
            {"params": params}, source, padding_mask, main_context,
            right_context, False, method=type(model).encode)
        if enc_pad is None:
            enc_pad = jnp.zeros(enc.shape[:2], bool)
        B = source.shape[0]
        prefixes = jnp.full((B, max_len + 1), pad, jnp.int32)
        prefixes = prefixes.at[:, 0].set(blank)
        lens = jnp.ones(B, jnp.int32)

        def cond(carry):
            _, lens, blocked = carry
            return ~jnp.all(blocked)

        def body(carry):
            prefixes, lens, blocked = carry
            lp = model.apply({"params": params}, prefixes, lens, enc,
                             enc_pad, method=type(model).decode_step)
            lp = lp.at[:, pad].set(-jnp.inf)
            tok = jnp.argmax(lp, axis=-1)
            emit = (~blocked) & (tok != blank) & (lens < max_len)
            prefixes = prefixes.at[jnp.arange(B), lens].set(
                jnp.where(emit, tok.astype(prefixes.dtype),
                          prefixes[jnp.arange(B), lens]))
            lens = lens + emit.astype(lens.dtype)
            return prefixes, lens, blocked | ~emit

        prefixes, lens, _ = jax.lax.while_loop(
            cond, body, (prefixes, lens, jnp.zeros(B, bool)))
        return prefixes, lens

    return decode


def make_s2s_greedy_decoder(model, vocab, main_context=None,
                            right_context=None, max_len: int = 200):
    """Jitted batched greedy decode for the seq2seq fine-tune head
    (``Wav2Vec2Seq2Seq``) — validation BLEU/WER during offline ASR/ST
    training (rain w2v2_s2s_task.py:199-236 runs its SequenceGenerator2
    per validation step; greedy is its beam=1 point).

    Same return contract as ``make_offline_greedy_decoder``: (prefixes,
    lens) with ``prefixes[:, 0]`` a sentinel (here eos, the fairseq prefix
    convention) so callers detokenize ``prefixes[r, 1:lens[r]]``.
    """
    import jax
    import jax.numpy as jnp

    eos, pad = vocab.eos(), vocab.pad()

    @jax.jit
    def decode(params, source, padding_mask):
        enc, enc_pad = model.apply(
            {"params": params}, source, padding_mask, main_context,
            right_context, False, method=type(model).encode)
        B = source.shape[0]
        prefixes = jnp.full((B, max_len + 1), pad, jnp.int32)
        prefixes = prefixes.at[:, 0].set(eos)
        lens = jnp.ones(B, jnp.int32)

        def cond(carry):
            _, _, blocked = carry
            return ~jnp.all(blocked)

        def body(carry):
            prefixes, lens, blocked = carry
            logits = model.apply({"params": params}, prefixes, enc, enc_pad,
                                 method=type(model).decode_logits)
            last = logits[jnp.arange(B), lens - 1]
            last = last.at[:, pad].set(-jnp.inf)
            tok = jnp.argmax(last, axis=-1)
            emit = (~blocked) & (tok != eos) & (lens < max_len)
            prefixes = prefixes.at[jnp.arange(B), lens].set(
                jnp.where(emit, tok.astype(prefixes.dtype),
                          prefixes[jnp.arange(B), lens]))
            lens = lens + emit.astype(lens.dtype)
            return prefixes, lens, blocked | ~emit

        prefixes, lens, _ = jax.lax.while_loop(
            cond, body, (prefixes, lens, jnp.zeros(B, bool)))
        return prefixes, lens

    return decode


def make_ctc_greedy_decoder(model, vocab, main_context=None,
                            right_context=None, blank: int = 0):
    """Jitted batched CTC best-path decode for ``Wav2VecCtc`` — argmax,
    collapse repeats, drop blanks (fairseq's viterbi/argmax WER path in
    criterions/ctc.py), entirely in-graph: kept tokens are compacted left
    with a stable argsort instead of a host loop.

    Same return contract as the other validation decoders: (prefixes,
    lens) with a sentinel at ``prefixes[:, 0]`` so callers detokenize
    ``prefixes[r, 1:lens[r]]``.
    """
    import jax
    import jax.numpy as jnp

    eos = vocab.eos()

    @jax.jit
    def decode(params, source, padding_mask):
        logits, lpad = model.apply(
            {"params": params}, source, padding_mask=padding_mask,
            main_context=main_context, right_context=right_context,
            train=False)
        ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)       # [B, T]
        prev = jnp.concatenate(
            [jnp.full_like(ids[:, :1], -1), ids[:, :-1]], axis=1)
        keep = (~lpad) & (ids != blank) & (ids != prev)
        # stable sort on "dropped?" compacts kept tokens to the left in
        # original time order
        order = jnp.argsort(~keep, axis=1, stable=True)
        toks = jnp.take_along_axis(ids, order, axis=1)
        lens = jnp.sum(keep, axis=1).astype(jnp.int32) + 1
        sentinel = jnp.full((ids.shape[0], 1), eos, toks.dtype)
        return jnp.concatenate([sentinel, toks], axis=1), lens

    return decode


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
