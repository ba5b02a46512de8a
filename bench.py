"""Benchmark: streaming blockwise encode throughput on one TPU chip.

Measures audio-seconds processed per wall-clock second through the wav2vec-S
Base blockwise encoder (bf16, mc=16/rc=8 — the published streaming config),
the dominant compute of both training and the streaming agent.  North star
(BASELINE.json): >= 500 streamed audio-sec/s/chip through the full agent
path; this benchmark tracks the encoder leg.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_AUDIO_SEC_PER_SEC = 500.0  # north-star target (BASELINE.md)


def main(attention_impl: str = "flash"):
    from wav2vec_s_tpu.models import Wav2Vec2Model, wav2vec_s_base_config

    cfg = wav2vec_s_base_config(dtype="bfloat16", encoder_layerdrop=0.0,
                                attention_impl=attention_impl)
    model = Wav2Vec2Model(cfg, encoder_type="blockwise")

    B, seconds = 32, 10.0
    S = int(seconds * 16000)
    src = jax.random.normal(jax.random.PRNGKey(0), (B, S), jnp.float32)
    mask_pos = jnp.zeros((B, 2), jnp.int32)

    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(
        dict(rngs, dropout=jax.random.PRNGKey(1),
             gumbel=jax.random.PRNGKey(2), negatives=jax.random.PRNGKey(3),
             layerdrop=jax.random.PRNGKey(4)),
        src, mask_pos, 0, train=False)

    @jax.jit
    def encode(params, source):
        feats, _ = model.apply({"params": params}, source,
                               method=Wav2Vec2Model.extract_features)
        # scalar checksum: forcing its host readback guarantees the full
        # forward actually executed (block_until_ready is unreliable over
        # the remote-device transport)
        return jnp.mean(feats.astype(jnp.float32))

    params = variables["params"]
    float(encode(params, src))  # compile + warmup

    iters = 10
    inputs = [src + i for i in range(iters)]
    t0 = time.perf_counter()
    acc = 0.0
    for x in inputs:
        acc += float(encode(params, x))
    dt = time.perf_counter() - t0
    assert acc == acc, "NaN checksum"

    audio_sec = B * seconds * iters
    value = audio_sec / dt
    print(json.dumps({
        "metric": "blockwise_encode_throughput",
        "value": round(value, 2),
        "unit": "audio_sec/s/chip",
        "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
