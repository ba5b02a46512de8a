"""Benchmark: full streaming agent path throughput on one TPU chip.

Headline metric (the north star, BASELINE.md): streamed audio-seconds
processed per wall-clock second through the FULL agent path — incremental
blockwise encode + cached jointer/LM greedy transducer decode — for the
wav2vec-S Base + CAAT base stack (bf16, mc=16/rc=8, DECISION_STEP=2, the
most chunk-intensive published operating point,
reference wav2vec_s_scripts/eval/eval_wav2vec_s_caat_st.sh:3).

Random weights emit a non-blank argmax essentially every step, so every
chunk pays the full ``max_emit`` decode iterations — a *pessimistic* bound
vs. real checkpoints, which emit blank (advance-source) most chunks.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}; the
"extras" field carries secondary metrics (encoder-only leg, DECISION_STEP=10
operating point).
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

# persistent compilation cache: the bench compiles several large fused
# scans (remote TPU compile ~minutes); repeat runs hit the cache.  TPU
# executables are host-independent here (same chip), unlike the CPU AOT
# entries the test conftest deliberately avoids.
jax.config.update("jax_compilation_cache_dir",
                  str(__import__("pathlib").Path(__file__).parent
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BASELINE_AUDIO_SEC_PER_SEC = 500.0  # north-star target (BASELINE.md)


def _compiled_flops(step, *args):
    """XLA cost-analysis FLOPs of a jitted step (None if unavailable)."""
    try:
        ca = step.lower(*args).compile().cost_analysis()
        if ca:
            ca0 = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float(ca0.get("flops", 0.0)) or None
    except Exception:
        pass
    return None


_FLOPS_SIDECAR = __import__("pathlib").Path(__file__).parent \
    / "bench_flops.json"


def _memo_flops(key: str, thunk):
    """File-backed memo for the MFU numerator (committed sidecar).

    The dense-twin steps exist only to produce one scalar (cost-analysis
    FLOPs), but over the remote-TPU tunnel each twin is a multi-minute
    cold compile — and the per-round-fresh checkout pays it again every
    time because the persistent ``.jax_cache`` is gitignored.  The scalar
    is deterministic for a given jax version + leg shape, so it is
    memoized in ``bench_flops.json`` keyed by both; on a hit the twin is
    never even built.
    """
    key = f"{key}:jax{jax.__version__}"
    try:
        memo = json.loads(_FLOPS_SIDECAR.read_text())
    except (OSError, ValueError):
        memo = {}
    if key in memo:
        return memo[key]
    flops = thunk()
    if flops:
        memo[key] = flops
        try:
            _FLOPS_SIDECAR.write_text(
                json.dumps(memo, indent=1, sort_keys=True) + "\n")
        except OSError:
            pass
    return flops


def encoder_bench(attention_impl: str = "flash"):
    """One-shot blockwise encode throughput (the round-1 headline)."""
    from wav2vec_s_tpu.models import Wav2Vec2Model, wav2vec_s_base_config

    cfg = wav2vec_s_base_config(dtype="bfloat16", encoder_layerdrop=0.0,
                                attention_impl=attention_impl)
    model = Wav2Vec2Model(cfg, encoder_type="blockwise")

    B, seconds = 32, 10.0
    S = int(seconds * 16000)
    src = jax.random.normal(jax.random.PRNGKey(0), (B, S), jnp.float32)
    mask_pos = jnp.zeros((B, 2), jnp.int32)

    variables = model.init(
        dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
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
    return B * seconds * iters / dt


def _build_caat(dtype="bfloat16", attention_impl="dense"):
    """wav2vec-S Base encoder + CAAT base decoder/jointer, random weights."""
    from wav2vec_s_tpu.models import wav2vec_s_base_config
    from wav2vec_s_tpu.models.caat import CaatConfig, W2V2CaatModel

    w2v = wav2vec_s_base_config(dtype=dtype, encoder_layerdrop=0.0,
                                attention_impl=attention_impl,
                                dropout=0.0, attention_dropout=0.0,
                                activation_dropout=0.0)
    caat = CaatConfig(dtype=dtype, dropout=0.0, attention_dropout=0.0,
                      activation_dropout=0.0)
    model = W2V2CaatModel(w2v, caat)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, 16000))
    prev = jnp.asarray([[caat.bos, 5, 6]], jnp.int32)
    rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
        ["params", "dropout", "gumbel", "negatives", "layerdrop",
         "rand_pos"])}
    variables = jax.jit(
        lambda: model.init(rngs, src, prev, train=False))()
    return model, variables["params"], w2v, caat


def agent_bench(decision_step: int, n_streams: int = 128,
                seconds: float = 10.0, max_emit: int = 4):
    """Full agent path: incremental encode + cached greedy decode.

    ``decision_step`` = blocks (of mc=16 frames) read per decode round —
    the reference's DECISION_STEP / --step-read-blocks operating point.
    """
    from wav2vec_s_tpu.data.dictionary import Dictionary
    from wav2vec_s_tpu.stream.batched import CachedFusedGreedyDecoder

    model, params, w2v, caat = _build_caat()
    vocab = Dictionary()
    for i in range(caat.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")

    S = int(seconds * 16000)
    frames = (S - 400) // 320 + 1
    t_cap = -(-(frames + w2v.right_context) // 128) * 128
    dec = CachedFusedGreedyDecoder(
        model, params, vocab, w2v, max_len=256, max_emit_per_chunk=max_emit,
        t_cap=t_cap, blocks_per_step=decision_step)
    dec.transfer_dtype = "int16"   # the SimulEval wire format

    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(S).astype(np.float32) * 0.1
            for _ in range(n_streams)]
    dec.decode_corpus(wavs)  # compile + warmup

    # steady-state serving pattern: stage batch k+1 (async host->device
    # copy) before blocking on batch k, so the host link overlaps compute.
    # Per-iteration timing, best-of (timeit-style min): the chip is shared
    # and a single co-tenant burst would otherwise set the whole number.
    iters = 4
    staged = dec.stage(wavs)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        nxt = dec.stage(wavs) if i + 1 < iters else None
        texts, delays = dec.decode_corpus(staged)
        times.append(time.perf_counter() - t0)
        staged = nxt
    assert any(texts), "decoder emitted nothing"
    return n_streams * seconds / min(times)


def oneshot_bench(decision_step: int, n_streams: int = 256,
                  seconds: float = 10.0, max_emit: int = 4):
    """Corpus-eval fast path: one-shot blockwise encode (flash mask) +
    fused chunkwise decision scan — emission-identical to the incremental
    agent path (tests/test_oneshot_decode.py), measured at the larger
    stream batch the lighter memory footprint allows."""
    from wav2vec_s_tpu.data.dictionary import Dictionary
    from wav2vec_s_tpu.stream.batched import OneShotCorpusDecoder

    model, params, w2v, caat = _build_caat(attention_impl="flash")
    vocab = Dictionary()
    for i in range(caat.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")

    S = int(seconds * 16000)
    frames = (S - 400) // 320 + 1
    t_cap = -(-(frames + w2v.right_context) // 128) * 128
    dec = OneShotCorpusDecoder(
        model, params, vocab, w2v, max_len=256, max_emit_per_chunk=max_emit,
        t_cap=t_cap, blocks_per_step=decision_step)
    dec.transfer_dtype = "int16"

    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(S).astype(np.float32) * 0.1
            for _ in range(n_streams)]
    dec.decode_corpus(wavs)  # compile + warmup

    # best-of per-iteration timing (see agent_bench)
    iters = 4
    staged = dec.stage(wavs)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        nxt = dec.stage(wavs) if i + 1 < iters else None
        texts, delays = dec.decode_corpus(staged)
        times.append(time.perf_counter() - t0)
        staged = nxt
    assert any(texts), "decoder emitted nothing"
    return n_streams * seconds / min(times)


def beam_bench(n_streams: int = 64, seconds: float = 10.0,
               beam: int = 5, max_steps: int = 8, max_len: int = 64,
               oneshot: bool = False, fused: bool = True):
    """Quality path: batched streaming BEAM decode at intra-beam 5
    (the published eval operating point, eval_wav2vec_s_caat_st.sh).

    ``oneshot`` switches to the corpus-eval fast path (one-shot encode,
    emission-identical); ``fused`` (default) uses the zero-host-sync
    decoders (device-side argmax re-seed + host emission replay —
    emission-identical at inter_beam=1, tests/test_beam_batched.py).
    ``max_len`` mirrors the reference agent's length cap (max_len_a *
    frames ~ 48 tokens for 10 s audio): random weights emit greedily to
    the cap, so an uncapped run measures an unrepresentative 250-token LM
    recompute width."""
    from wav2vec_s_tpu.data.dictionary import Dictionary
    from wav2vec_s_tpu.stream.beam_batched import (
        BatchedBeamStreamingDecoder, FusedBeamStreamingDecoder,
        FusedOneShotBeamDecoder, OneShotBeamDecoder)

    model, params, w2v, caat = _build_caat(
        attention_impl="flash" if oneshot else "dense")
    vocab = Dictionary()
    for i in range(caat.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")

    S = int(seconds * 16000)
    frames = (S - 400) // 320 + 1
    t_cap = -(-(frames + w2v.right_context) // 128) * 128
    if fused:
        klass = (FusedOneShotBeamDecoder if oneshot
                 else FusedBeamStreamingDecoder)
    else:
        klass = OneShotBeamDecoder if oneshot else BatchedBeamStreamingDecoder
    dec = klass(
        model, params, vocab, w2v, beam_size=beam, inter_beam=1,
        max_steps=max_steps, max_len=max_len, eager=True, t_cap=t_cap,
        blocks_per_step=2)
    if fused:
        dec.transfer_dtype = "int16"   # the SimulEval wire format
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(S).astype(np.float32) * 0.1
            for _ in range(n_streams)]
    dec.decode_corpus(wavs)  # compile + warmup

    # variance-robust timing (round-4 verdict: the driver capture and
    # same-session numbers disagreed by up to 34%): 5 timed passes,
    # report the min — the chip is shared and a single co-tenant burst
    # would otherwise set the number.  Steady-state serving pattern (as
    # the greedy legs): stage batch k+1 before blocking on batch k so
    # the host link overlaps compute — the synchronous per-pass audio
    # upload was most of the old beam legs' wall clock.
    iters = 5
    if fused:
        staged = dec.stage(wavs)
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            nxt = dec.stage(wavs) if i + 1 < iters else None
            texts, _ = dec.decode_corpus(staged)
            times.append(time.perf_counter() - t0)
            staged = nxt
    else:
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            texts, _ = dec.decode_corpus(wavs)
            times.append(time.perf_counter() - t0)
    assert any(texts), "beam decoder emitted nothing"
    return n_streams * seconds / min(times)


def train_bench(attention_impl: str = "dense", B: int = 8,
                seconds: float = 10.0, U: int = 40, iters: int = 5):
    """CAAT fine-tune train step (base dims): updates/s + est. MFU.

    All dropout off so the dense- vs flash-attention comparison is
    apples-to-apples (the flash kernel has no in-kernel dropout and the
    encoder falls back to dense otherwise).
    """
    import os

    from wav2vec_s_tpu.models import wav2vec_s_base_config
    from wav2vec_s_tpu.models.caat import CaatConfig, W2V2CaatModel
    from wav2vec_s_tpu.train.optim import OptimConfig, build_optimizer
    from wav2vec_s_tpu.train.recipes import make_caat_loss_fn
    from wav2vec_s_tpu.train.step import TrainState, make_train_step

    def build(impl):
        w2v = wav2vec_s_base_config(
            dtype="bfloat16", encoder_layerdrop=0.0,
            attention_impl=impl, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0)
        caat = CaatConfig(dtype="bfloat16", dropout=0.0,
                          attention_dropout=0.0, activation_dropout=0.0)
        return w2v, caat, W2V2CaatModel(w2v, caat)

    w2v, caat, model = build(attention_impl)

    S = int(seconds * 16000)
    src = jax.random.normal(jax.random.PRNGKey(0), (B, S), jnp.float32)
    tgt = np.random.default_rng(0).integers(4, caat.vocab_size, (B, U))
    tgt[:, -1] = caat.eos
    tgt = jnp.asarray(tgt, jnp.int32)
    prev = jnp.concatenate(
        [jnp.full((B, 1), caat.bos, jnp.int32), tgt], axis=1)

    rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
        ["params", "dropout", "gumbel", "negatives", "layerdrop",
         "rand_pos"])}
    variables = jax.jit(lambda: model.init(rngs, src[:1], prev[:1],
                                           train=False))()
    opt = build_optimizer(OptimConfig(lr=1e-4, warmup_updates=100))
    state = TrainState.create(variables["params"], opt)
    loss_fn = make_caat_loss_fn(model, caat, main_context=16,
                                right_context=8)
    step = jax.jit(make_train_step(loss_fn, opt), donate_argnums=0)
    batch = {"source": src, "targets": tgt}

    # MFU numerator: the DENSE-attention twin's cost-analysis FLOPs for
    # every impl — a fixed, impl-independent workload measure (the flash
    # graph's own count mixes Pallas accounting artifacts into the
    # denominator and made wall-clock-faster kernels look "lower-MFU")
    def _twin_flops():
        if attention_impl == "dense":
            return _compiled_flops(step, state, batch, jax.random.PRNGKey(1))
        _, _, dmodel = build("dense")
        dloss = make_caat_loss_fn(dmodel, caat, main_context=16,
                                  right_context=8)
        dstep = jax.jit(make_train_step(dloss, opt), donate_argnums=0)
        return _compiled_flops(dstep, state, batch, jax.random.PRNGKey(1))

    flops = _memo_flops(f"train:B{B}:s{seconds}:U{U}:mc16:rc8",
                        _twin_flops)

    state, logs = step(state, batch, jax.random.PRNGKey(1))
    float(logs["loss_total"])                 # compile + warmup sync
    # steady-state trainer pattern (train/cli.py): steps are dispatched
    # back-to-back, metrics read back only at log intervals — per-step
    # host syncs left the chip ~18% idle (profiled).  Best-of-2 windows
    # (shared chip; see agent_bench).
    times = []
    for w in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            state, logs = step(state, batch, jax.random.PRNGKey(2 + i))
        loss = float(logs["loss_total"])      # one sync per log window
        times.append(time.perf_counter() - t0)
    assert loss == loss, "NaN loss in train bench"
    ups = iters / min(times)
    peak = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))  # v5e bf16
    mfu = (flops * ups / peak) if flops else None
    return {
        "updates_per_sec": round(ups, 3),
        "audio_sec_per_sec": round(B * seconds * ups, 2),
        "est_mfu": round(mfu, 4) if mfu is not None else None,
    }


def pretrain_bench(B: int = 6, seconds: float = 15.0, iters: int = 5,
                   attention_impl: str = "flash"):
    """wav2vec-S pre-training step (base dims): updates/s + est. MFU.

    The 400k-update pre-train dominates the reference recipe's compute
    (wav2vec-S_base_librispeech.yaml: max_tokens 1.4M samples/GPU); B=6 x
    15 s ~ 1.44M samples matches that per-chip batch.  Constant (mc=16,
    rc=8) context — the middle of the sampled-bucket grid the CLI draws
    from per update (train/recipes.py)."""
    import os

    from wav2vec_s_tpu.models import Wav2Vec2Model, wav2vec_s_base_config
    from wav2vec_s_tpu.train.optim import OptimConfig, build_optimizer
    from wav2vec_s_tpu.train.recipes import make_pretrain_loss_fn
    from wav2vec_s_tpu.train.step import TrainState, make_train_step
    from wav2vec_s_tpu.models.feature_extractor import conv_output_length
    from wav2vec_s_tpu.utils.masking import (
        compute_span_mask_np, expected_mask_count)

    def build(impl):
        c = wav2vec_s_base_config(dtype="bfloat16", encoder_layerdrop=0.0,
                                  attention_impl=impl)
        return c, Wav2Vec2Model(c, encoder_type="blockwise")

    cfg, model = build(attention_impl)

    S = int(seconds * 16000)
    src = jax.random.normal(jax.random.PRNGKey(0), (B, S), jnp.float32)
    frames = conv_output_length(S, cfg.conv_feature_layers)
    M = expected_mask_count(frames, cfg.mask_prob, cfg.mask_length)
    rng = np.random.default_rng(0)
    mask = compute_span_mask_np((B, frames), None, cfg.mask_prob,
                                cfg.mask_length, rng, exact_count=M)
    positions = np.zeros((B, M), np.int32)
    for r in range(B):
        positions[r] = np.flatnonzero(mask[r])[:M]
    batch = {"source": src, "mask_positions": jnp.asarray(positions)}

    rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
        ["params", "dropout", "gumbel", "negatives", "layerdrop"])}
    variables = jax.jit(lambda: model.init(
        rngs, src[:1], batch["mask_positions"][:1], 0, train=False))()
    opt = build_optimizer(OptimConfig(lr=5e-4, warmup_updates=100,
                                      lr_scheduler="polynomial_decay"))
    state = TrainState.create(variables["params"], opt)
    loss_fn = make_pretrain_loss_fn(model, main_context=16, right_context=8)
    step = jax.jit(make_train_step(loss_fn, opt), donate_argnums=0)

    # dense-twin FLOPs for the MFU numerator regardless of measured impl
    # (see train_bench)
    def _twin_flops():
        if attention_impl == "dense":
            return _compiled_flops(step, state, batch, jax.random.PRNGKey(1))
        _, dmodel = build("dense")
        dloss = make_pretrain_loss_fn(dmodel, main_context=16,
                                      right_context=8)
        dstep = jax.jit(make_train_step(dloss, opt), donate_argnums=0)
        return _compiled_flops(dstep, state, batch, jax.random.PRNGKey(1))

    flops = _memo_flops(f"pretrain:B{B}:s{seconds}:M{M}:mc16:rc8",
                        _twin_flops)

    state, logs = step(state, batch, jax.random.PRNGKey(1))
    float(logs["loss_total"])                 # compile + warmup sync
    # best-of-2 windows (shared chip; see agent_bench)
    times = []
    for w in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            state, logs = step(state, batch, jax.random.PRNGKey(2 + i))
        loss = float(logs["loss_total"])      # one sync per log window
        times.append(time.perf_counter() - t0)
    assert loss == loss, "NaN loss in pretrain bench"
    ups = iters / min(times)
    peak = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))  # v5e bf16
    mfu = (flops * ups / peak) if flops else None
    return {
        "updates_per_sec": round(ups, 3),
        "audio_sec_per_sec": round(B * seconds * ups, 2),
        "est_mfu": round(mfu, 4) if mfu is not None else None,
    }


def lattice_bench(impl: str, B=16, T=32, U=65, V=512, iters=10):
    """Delay-transducer loss fwd+bwd: XLA row scans vs Pallas kernels."""
    from wav2vec_s_tpu.ops.transducer import analytic
    from wav2vec_s_tpu.ops.transducer.jnp_impl import (
        delay_cost_diag_positive)

    acts = jax.random.normal(jax.random.PRNGKey(0), (B, T, U, V),
                             jnp.float32)
    labels = jnp.asarray(
        np.random.default_rng(0).integers(1, V, (B, U - 1)), jnp.int32)
    al = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), U - 1, jnp.int32)
    dv = delay_cost_diag_positive((B, T, U), al, ll)

    def loss(a):
        total, _, _ = analytic.delay_transducer_loss_vjp(
            a, labels, al, ll, dv, 1.0, 0, 1.0)
        return jnp.sum(total)

    analytic.set_lattice_impl(impl)
    try:
        g = jax.jit(jax.grad(loss))
        float(jnp.sum(g(acts)))               # compile + warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            float(jnp.sum(g(acts)))
        dt = time.perf_counter() - t0
    finally:
        analytic.set_lattice_impl("auto")
    return dt / iters * 1000.0                # ms / fwd+bwd


def main():
    agent_ds2 = agent_bench(decision_step=2)
    agent_ds10 = agent_bench(decision_step=10)
    oneshot_ds2 = oneshot_bench(decision_step=2)
    enc = encoder_bench()
    beam5 = beam_bench()
    oneshot_beam5 = beam_bench(n_streams=64, oneshot=True)
    train_dense = train_bench("dense")
    train_flash = train_bench("flash")
    pretrain = pretrain_bench()
    lat_xla = lattice_bench("xla")
    lat_pal = lattice_bench("pallas")
    print(json.dumps({
        "metric": "streaming_agent_throughput_ds2",
        "value": round(agent_ds2, 2),
        "unit": "audio_sec/s/chip",
        "vs_baseline": round(agent_ds2 / BASELINE_AUDIO_SEC_PER_SEC, 3),
        "extras": {
            "streaming_agent_throughput_ds10": round(agent_ds10, 2),
            "oneshot_corpus_throughput_ds2": round(oneshot_ds2, 2),
            "blockwise_encode_throughput": round(enc, 2),
            "streaming_beam5_throughput": round(beam5, 2),
            "oneshot_beam5_throughput": round(oneshot_beam5, 2),
            "train_step_dense_attn": train_dense,
            "train_step_flash_attn": train_flash,
            "pretrain_step": pretrain,
            "transducer_loss_ms_xla": round(lat_xla, 2),
            "transducer_loss_ms_pallas": round(lat_pal, 2),
        },
    }))


if __name__ == "__main__":
    main()
