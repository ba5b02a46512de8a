"""One-shot corpus decoder == incremental cached fused decoder.

The corpus-eval fast path (one-shot blockwise encode + fused decision scan)
must produce exactly the texts AND delays of the true streaming path — the
blockwise encoder is prefix-exact at block granularity, so revealing the
one-shot outputs on the chunk schedule is indistinguishable from
incremental encoding."""

import numpy as np
import pytest

from tests.test_batched_streaming import _setup
from tests.test_caat import W2V_TINY
from wav2vec_s_tpu.stream.batched import (CachedFusedGreedyDecoder,
                                          OneShotCorpusDecoder)


pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


@pytest.mark.parametrize("blocks_per_step", [1, 2])
def test_oneshot_matches_cached_fused(blocks_per_step):
    dec, vocab = _setup(max_emit=4)
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(2400).astype(np.float32) * 0.1,
            rng.standard_normal(2400).astype(np.float32) * 0.1,
            rng.standard_normal(2400).astype(np.float32) * 0.1]
    kw = dict(max_len=12, max_emit_per_chunk=4, t_cap=128,
              blocks_per_step=blocks_per_step)
    a = CachedFusedGreedyDecoder(dec.model, dec.params, vocab,
                                 W2V_TINY, **kw)
    b = OneShotCorpusDecoder(dec.model, dec.params, vocab, W2V_TINY, **kw)
    ta, da = a.decode_corpus(wavs)
    tb, db = b.decode_corpus(wavs)
    assert ta == tb
    assert da == db


def test_oneshot_int16_staging_round_trip():
    dec, vocab = _setup(max_emit=4)
    rng = np.random.default_rng(1)
    wavs = [rng.standard_normal(1600).astype(np.float32) * 0.1,
            rng.standard_normal(2400).astype(np.float32) * 0.1]
    kw = dict(max_len=12, max_emit_per_chunk=4, t_cap=128)
    d = OneShotCorpusDecoder(dec.model, dec.params, vocab, W2V_TINY, **kw)
    d.transfer_dtype = "int16"
    staged = d.stage(wavs)
    texts, delays = d.decode_corpus(staged)
    assert len(texts) == 2
    for dd in delays:
        assert dd == sorted(dd)


def test_unrolled_emit_loop_matches_while():
    """emit_loop='unroll' must produce identical emissions and delays."""
    dec, vocab = _setup(max_emit=4)
    rng = np.random.default_rng(2)
    wavs = [rng.standard_normal(2400).astype(np.float32) * 0.1,
            rng.standard_normal(2400).astype(np.float32) * 0.1]
    kw = dict(max_len=12, max_emit_per_chunk=4, t_cap=128)
    a = OneShotCorpusDecoder(dec.model, dec.params, vocab, W2V_TINY, **kw)
    b = OneShotCorpusDecoder(dec.model, dec.params, vocab, W2V_TINY, **kw)
    b.emit_loop = "unroll"
    c = CachedFusedGreedyDecoder(dec.model, dec.params, vocab, W2V_TINY,
                                 **kw)
    c.emit_loop = "unroll"
    ta, da = a.decode_corpus(wavs)
    tb, db = b.decode_corpus(wavs)
    tc, dc = c.decode_corpus(wavs)
    assert ta == tb == tc
    assert da == db == dc


def test_oneshot_shards_streams_over_data_mesh():
    """Multi-chip batched serving: staging the corpus with its stream axis
    sharded over the `data` mesh axis must compile (SPMD partitions the
    fused decision scan) and produce the single-device texts/delays."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wav2vec_s_tpu.parallel.mesh import AXES, make_mesh

    dec, vocab = _setup(max_emit=4)
    rng = np.random.default_rng(5)
    wavs = [rng.standard_normal(2400).astype(np.float32) * 0.1
            for _ in range(4)]
    kw = dict(max_len=12, max_emit_per_chunk=4, t_cap=128)
    a = OneShotCorpusDecoder(dec.model, dec.params, vocab, W2V_TINY, **kw)
    ta, da = a.decode_corpus(wavs)

    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    b = OneShotCorpusDecoder(dec.model, dec.params, vocab, W2V_TINY, **kw)
    N, max_samples, audio = b.stage(wavs)
    sharded = jax.device_put(audio, NamedSharding(mesh, P(AXES.data)))
    tb, db = b.decode_corpus((N, max_samples, sharded))
    assert ta == tb
    assert da == db
