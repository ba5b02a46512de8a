"""Pre-training criterion: InfoNCE + weighted extra losses.

Behavioral twin of ``Wav2vecCriterion`` with ``infonce=true,
loss_weights=[0.1, 10]`` (fairseq/fairseq/criterions/wav2vec_criterion.py:36-160
and the wav2vec-S yaml): summed cross-entropy over masked frames with the
positive at class 0, plus ``0.1 * (V - prob_ppl)/V * sample_size`` (codebook
diversity) and ``10 * features_pen * sample_size`` (feature L2), where
``sample_size = B * M`` masked frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_LOSS_WEIGHTS = (0.1, 10.0)


def wav2vec_loss(net_output: dict, loss_weights=DEFAULT_LOSS_WEIGHTS):
    """Returns (loss, sample_size, logs). Loss is a sum (divide by
    sample_size outside for the mean)."""
    logits = net_output["logits"].astype(jnp.float32)     # [B, M, 1+N]
    B, M, K = logits.shape
    sample_size = B * M

    logp = jax.nn.log_softmax(logits, axis=-1)
    main_loss = -jnp.sum(logp[:, :, 0])

    extra = []
    if net_output.get("prob_perplexity") is not None:
        V = net_output["num_vars"]
        extra.append((V - net_output["prob_perplexity"]) / V)
    extra.append(net_output["features_pen"])
    w = loss_weights
    if len(w) == 1:
        w = tuple(w) * len(extra)
    assert len(w) == len(extra)

    loss = main_loss
    logs = {"loss_infonce": main_loss, "sample_size": jnp.asarray(sample_size)}
    for i, (coef, p) in enumerate(zip(w, extra)):
        if coef != 0 and p is not None:
            pl = coef * p.astype(jnp.float32) * sample_size
            loss = loss + pl
            logs[f"loss_extra_{i}"] = pl

    # accuracy diagnostics (ties counted as wrong, criterion :138-152)
    is_max = jnp.argmax(logits, axis=-1) == 0
    is_min = jnp.argmin(logits, axis=-1) == 0
    correct = jnp.sum(is_max) - jnp.sum(is_max & is_min)
    logs.update(
        loss=loss, correct=correct, count=jnp.asarray(B * M),
        prob_perplexity=net_output.get("prob_perplexity"),
        code_perplexity=net_output.get("code_perplexity"),
        temp=net_output.get("temp"),
    )
    return loss, sample_size, logs
