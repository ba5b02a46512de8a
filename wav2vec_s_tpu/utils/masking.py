"""Span-mask sampling for masked contrastive pre-training.

Two implementations of the wav2vec 2.0 span masker (behavioral twin of the
reference's numpy ``compute_mask_indices``, fairseq/fairseq/data/data_utils.py,
used at wav2vec2.py:431-443 with ``mask_prob=0.65, mask_length=10,
mask_selection="static", min_masks=2``):

- ``compute_span_mask_np`` — host-side numpy, for dataloader precompute.  The
  reference already precomputes masks on the host for its TPU path
  (fairseq/fairseq/tasks/audio_pretraining.py:183-239); we make that the
  default: masks are sampled per-example while batches are assembled, so the
  jit-compiled train step stays free of host RNG.
- ``sample_span_mask`` — in-jit jax version with *static shapes* (fixed
  number of span starts per row), for fully-device-side pipelines.

Both guarantee a fixed number of masked frames per example (``static`` span
selection + the reference's behavior of sampling exactly
``num_spans = ceil(mask_prob * T / L + rand())`` span starts with overlap
allowed), which is what makes the downstream gather of masked positions a
static-shaped op on TPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def num_mask_spans(seq_len: int, mask_prob: float, mask_length: int,
                   min_masks: int = 2, rand: float = 0.0) -> int:
    """Number of span starts the reference samples for a row of ``seq_len``."""
    all_num_mask = int(mask_prob * seq_len / float(mask_length) + rand)
    return max(min_masks, all_num_mask)


def expected_mask_count(seq_len: int, mask_prob: float = 0.65,
                        mask_length: int = 10, min_masks: int = 2) -> int:
    """Deterministic per-length mask count for shape-stable batches.

    Overlap between sampled spans makes the reference's realized count vary
    around ~0.8 * n_spans * L; we pin it to a fixed fraction so every batch
    of a given length bucket has the same gather shape (one compile per
    bucket instead of one per batch).
    """
    n_spans = num_mask_spans(seq_len, mask_prob, mask_length, min_masks)
    approx = int(round(n_spans * mask_length * 0.8))
    return max(mask_length, min(approx, seq_len - 1))


def compute_span_mask_np(
    shape: tuple[int, int],
    padding_mask: np.ndarray | None,
    mask_prob: float,
    mask_length: int,
    rng: np.random.Generator,
    min_masks: int = 2,
    require_same_masks: bool = True,
    exact_count: int | None = None,
) -> np.ndarray:
    """Sample a [B, T] boolean span mask (True = masked).

    Static span selection with overlap allowed; when ``require_same_masks``
    every row ends up with the same number of masked frames (the minimum over
    the batch), which the model relies on for static-shaped gathers.  With
    ``exact_count`` every row is trimmed/topped-up to exactly that many
    masked frames (shape-stable across batches of the same length).
    """
    B, T = shape
    mask = np.zeros((B, T), dtype=bool)
    rand_add = rng.random()
    for b in range(B):
        sz = T
        if padding_mask is not None:
            sz = int(T - padding_mask[b].sum())
        num_mask = num_mask_spans(sz, mask_prob, mask_length, min_masks, rand_add)
        hi = max(1, sz - mask_length)
        starts = rng.integers(0, hi, size=num_mask)
        idx = (starts[:, None] + np.arange(mask_length)[None, :]).reshape(-1)
        idx = idx[idx < sz]
        mask[b, idx] = True
    if exact_count is not None:
        for b in range(B):
            sz = T
            if padding_mask is not None:
                sz = int(T - padding_mask[b].sum())
            want = min(exact_count, max(sz - 1, 1))
            on = np.flatnonzero(mask[b])
            if len(on) > want:
                off = rng.choice(on, size=len(on) - want, replace=False)
                mask[b, off] = False
            elif len(on) < want:
                cand = np.flatnonzero(~mask[b][:sz])
                add = rng.choice(cand, size=want - len(on), replace=False)
                mask[b, add] = True
        return mask
    if require_same_masks:
        n_min = mask.sum(axis=1).min()
        for b in range(B):
            extra = int(mask[b].sum() - n_min)
            if extra > 0:
                on = np.flatnonzero(mask[b])
                off = rng.choice(on, size=extra, replace=False)
                mask[b, off] = False
    return mask


def sample_span_mask(
    key: jax.Array,
    shape: tuple[int, int],
    padding_mask: jnp.ndarray | None,
    mask_prob: float,
    mask_length: int,
    min_masks: int = 2,
) -> jnp.ndarray:
    """jit-friendly span mask: [B, T] bool, static number of spans per row.

    Uses the full row length for span-count computation (rows are typically
    crop-collated to equal length in pre-training, matching the reference's
    ``max_sample_size`` crop path, raw_audio_dataset.py:73-81).
    """
    B, T = shape
    n_spans = num_mask_spans(T, mask_prob, mask_length, min_masks)
    hi = max(1, T - mask_length)
    starts = jax.random.randint(key, (B, n_spans), 0, hi)
    span = starts[:, :, None] + jnp.arange(mask_length)[None, None, :]
    onehot = jax.nn.one_hot(span.reshape(B, -1), T, dtype=jnp.bool_)
    mask = jnp.any(onehot, axis=1)
    if padding_mask is not None:
        mask = mask & ~padding_mask
    return mask
