"""Batch assembly for the two training recipes (host-side, numpy).

Twins of the reference collaters with TPU-static shapes:

- ``PretrainBatcher`` ~ ``RawAudioDataset.collater``
  (raw_audio_dataset.py:116-226): random-crop every utterance to the batch's
  *bucket* length (the reference crops to the batch min; a bucket keeps the
  compiled-shape count bounded), plus host-side span-mask precompute with an
  equal mask count per row (the strategy the reference uses for its TPU path,
  audio_pretraining.py:183-239).
- ``CaatBatcher`` ~ ``SpeechToTextDataset.collater``
  (st_raw_audio_triple_dataset.py:298-387): pad waveforms to the audio
  bucket, tokenize + pad targets to the text bucket; emits
  source/padding_mask/targets.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from wav2vec_s_tpu.data.audio import (
    read_audio, read_audio_batch, instance_normalize)
from wav2vec_s_tpu.data.batching import bucket_for, pad_to
from wav2vec_s_tpu.data.dictionary import Dictionary
from wav2vec_s_tpu.data.manifests import AudioManifest, S2TManifest
from wav2vec_s_tpu.data.tokenizer import Tokenizer
from wav2vec_s_tpu.models.feature_extractor import conv_output_length
from wav2vec_s_tpu.utils.masking import (
    compute_span_mask_np, expected_mask_count)


@dataclasses.dataclass
class PretrainBatcher:
    manifest: AudioManifest
    buckets: Sequence[int]
    mask_prob: float = 0.65
    mask_length: int = 10
    normalize: bool = False
    seed: int = 1

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    def load(self, idx: int) -> np.ndarray:
        wav = read_audio(self.manifest.full_path(idx))
        if self.normalize:
            wav = instance_normalize(wav)
        return wav

    def collate(self, indices: np.ndarray,
                size_hint: Optional[int] = None) -> Dict[str, np.ndarray]:
        """``size_hint``: the GLOBAL batch's shortest sample size — on
        multi-host runs every process collates its row slice of one global
        batch and must pick the same crop bucket (train/cli.py passes the
        manifest-derived global min)."""
        stride = int(max(self.manifest.sizes[i] for i in indices))
        wavs = read_audio_batch(
            [self.manifest.full_path(i) for i in indices], stride)
        if self.normalize:
            wavs = [instance_normalize(w) for w in wavs]
        shortest = min(len(w) for w in wavs)
        if size_hint is not None:
            shortest = min(shortest, size_hint)
        # crop to the bucket at/below the batch's shortest (no padding in
        # pre-training — crop-only, like pad_audio=False in the reference)
        usable = [b for b in self.buckets if b <= shortest]
        T = usable[-1] if usable else self.buckets[0]
        out = np.zeros((len(wavs), T), np.float32)
        for r, w in enumerate(wavs):
            if len(w) > T:
                start = self._rng.integers(0, len(w) - T + 1)
                out[r] = w[start:start + T]
            else:
                out[r, :len(w)] = w

        frames = conv_output_length(T)
        M = expected_mask_count(frames, self.mask_prob, self.mask_length)
        mask = compute_span_mask_np(
            (len(wavs), frames), None, self.mask_prob, self.mask_length,
            self._rng, exact_count=M)
        positions = np.zeros((len(wavs), M), np.int32)
        for r in range(len(wavs)):
            positions[r] = np.flatnonzero(mask[r])[:M]
        return {"source": out, "mask_positions": positions}


@dataclasses.dataclass
class CaatBatcher:
    manifest: S2TManifest
    tgt_dict: Dictionary
    tokenizer: Tokenizer
    audio_buckets: Sequence[int]
    target_buckets: Sequence[int] = (16, 32, 64, 128)
    task_type: str = "st"              # "st" -> tgt_text, "asr" -> src_text
    normalize: bool = False
    features: str = "raw"              # "raw" waveform | "fbank" log-mel
    # (rain st_raw_audio_triple_dataset serves both: raw for w2v2 models,
    # fbank via audio_encoder transforms for the fbank family)
    transforms: Sequence = ()          # fbank feature transforms
    # (rain audio_encoder.py:42-79 Whiten/TFMask), applied in order after
    # logmel; strip augmentation (TFMask) for validation batchers

    def encode_target(self, idx: int) -> List[int]:
        text = (self.manifest.tgt_texts[idx] if self.task_type != "asr"
                else (self.manifest.src_texts[idx]
                      or self.manifest.tgt_texts[idx]))
        pieces = self.tokenizer.encode(text)
        return self.tgt_dict.encode(pieces, append_eos=True)

    def collate(self, indices: np.ndarray,
                size_hint: Optional[int] = None) -> Dict[str, np.ndarray]:
        """``size_hint``: the GLOBAL batch's longest audio (samples for
        raw, frames for fbank) — multi-host processes collate row slices
        of one global batch and must agree on the pad bucket.  (Targets:
        use a single-valued ``target_buckets`` on multi-host runs so the
        text dim is host-independent too.)"""
        stride = int(max(self.manifest.n_frames[i] for i in indices))
        raw = read_audio_batch(
            [self.manifest.audio_paths[i] for i in indices], stride)
        wavs, targets = [], []
        for wav, i in zip(raw, indices):
            if self.normalize:
                wav = instance_normalize(wav)
            if self.features == "fbank":
                from wav2vec_s_tpu.data.audio import logmel_fbank
                wav = logmel_fbank(wav)               # [T_frames, 80]
                for t in self.transforms:
                    wav = t(wav)
            wavs.append(wav)
            targets.append(np.asarray(self.encode_target(i), np.int64))

        S = bucket_for(max([len(w) for w in wavs] + [size_hint or 0]),
                       self.audio_buckets)
        U = bucket_for(max(len(t) for t in targets), self.target_buckets)
        B = len(wavs)
        feat_shape = (S,) if wavs[0].ndim == 1 else (S, wavs[0].shape[1])
        src = np.zeros((B,) + feat_shape, np.float32)
        pad_mask = np.ones((B, S), bool)
        tgt = np.full((B, U), self.tgt_dict.pad(), np.int32)
        for r, (w, t) in enumerate(zip(wavs, targets)):
            w = w[:S]
            src[r, :len(w)] = w
            pad_mask[r, :len(w)] = False
            t = t[:U]
            tgt[r, :len(t)] = t
        return {"source": src, "padding_mask": pad_mask, "targets": tgt}


@dataclasses.dataclass
class TextBatcher:
    """Parallel-text collater for the text-source CAAT family — twin of
    the reference's bitext path (rain/tasks/dropout_translation.py over
    ``TranslationTask`` + ``BpeDropoutDataset``): tokenize both sides
    (source with BPE dropout when the tokenizer carries it), eos-append,
    pad to static buckets.  Emits {source: [B, S] int32 tokens,
    targets: [B, U] int32} — the same batch contract as ``CaatBatcher``
    with token ids in place of waveforms, so the train step / loss
    factories are shared unchanged."""

    manifest: S2TManifest
    tgt_dict: Dictionary
    tokenizer: Tokenizer                     # target side (no dropout)
    src_buckets: Sequence[int] = (16, 32, 64, 128, 256, 512)
    target_buckets: Sequence[int] = (16, 32, 64, 128)
    src_dict: Optional[Dictionary] = None    # None -> shared with target
    src_tokenizer: Optional[Tokenizer] = None  # None -> shared (may carry
    # BPE dropout; validation batchers should pass a dropout-free one)

    def _encode(self, text: str, src: bool) -> List[int]:
        tok = (self.src_tokenizer or self.tokenizer) if src \
            else self.tokenizer
        d = (self.src_dict or self.tgt_dict) if src else self.tgt_dict
        return d.encode(tok.encode(text), append_eos=True)

    def collate(self, indices: np.ndarray,
                size_hint: Optional[int] = None) -> Dict[str, np.ndarray]:
        srcs = [np.asarray(self._encode(self.manifest.src_texts[i], True),
                           np.int64) for i in indices]
        tgts = [np.asarray(self._encode(self.manifest.tgt_texts[i], False),
                           np.int64) for i in indices]
        S = bucket_for(max([len(s) for s in srcs] + [size_hint or 0]),
                       self.src_buckets)
        U = bucket_for(max(len(t) for t in tgts), self.target_buckets)
        B = len(srcs)
        src_pad = (self.src_dict or self.tgt_dict).pad()
        src = np.full((B, S), src_pad, np.int32)
        tgt = np.full((B, U), self.tgt_dict.pad(), np.int32)
        for r, (s, t) in enumerate(zip(srcs, tgts)):
            src[r, :len(s[:S])] = s[:S]
            tgt[r, :len(t[:U])] = t[:U]
        return {"source": src, "targets": tgt}
