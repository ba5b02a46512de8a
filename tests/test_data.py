"""Data layer tests: audio IO, manifests, dictionary, batching."""

import numpy as np
import pytest

from wav2vec_s_tpu.data import (
    read_audio, write_wav, Dictionary, read_audio_manifest,
    read_s2t_manifest, batch_by_size, EpochBatchIterator)
from wav2vec_s_tpu.data.audio import logmel_fbank, instance_normalize
from wav2vec_s_tpu.data.batching import length_buckets, bucket_for
from wav2vec_s_tpu.data.tokenizer import (
    WordTokenizer, CharTokenizer, is_word_end)


def test_wav_roundtrip(tmp_path, rng):
    wav = (rng.standard_normal(1600) * 0.3).astype(np.float32)
    write_wav(tmp_path / "a.wav", wav)
    back = read_audio(tmp_path / "a.wav")
    np.testing.assert_allclose(back, np.clip(wav, -1, 1), atol=6e-5)


def test_read_audio_rate_check(tmp_path, rng):
    wav = rng.standard_normal(800).astype(np.float32)
    write_wav(tmp_path / "a.wav", wav, rate=8000)
    with pytest.raises(ValueError):
        read_audio(tmp_path / "a.wav", expected_rate=16000)


def test_npy_audio(tmp_path, rng):
    wav = rng.standard_normal(100).astype(np.float32)
    np.save(tmp_path / "a.npy", wav)
    np.testing.assert_array_equal(read_audio(tmp_path / "a.npy"), wav)


def test_dictionary_fairseq_layout(tmp_path):
    d = Dictionary()
    assert (d.bos(), d.pad(), d.eos(), d.unk()) == (0, 1, 2, 3)
    d.add_symbol("hello", 5)
    d.add_symbol("world", 3)
    assert d.index("hello") == 4
    assert d.index("zzz") == d.unk()
    p = tmp_path / "dict.txt"
    d.save(p)
    d2 = Dictionary.load(p)
    assert d2.index("world") == d.index("world")
    assert d2.encode(["hello", "world"]) == [4, 5, d.eos()]


def test_audio_manifest(tmp_path):
    m = tmp_path / "train.tsv"
    m.write_text("/data/audio\na.wav\t48000\nb.wav\t16000\nc.wav\t100\n")
    man = read_audio_manifest(m, min_sample_size=16000)
    assert len(man) == 2  # c.wav filtered
    assert str(man.full_path(0)).endswith("audio/a.wav")


def test_s2t_manifest(tmp_path):
    m = tmp_path / "st.tsv"
    m.write_text("id\taudio\tn_frames\ttgt_text\tsrc_text\n"
                 "u1\ta.wav\t100\thallo welt\thello world\n"
                 "u2\tb.wav\t50\tdu\tyou\n")
    man = read_s2t_manifest(m, audio_root="/root/audio")
    assert man.audio_paths[0] == "/root/audio/a.wav"
    assert man.tgt_texts[1] == "du"
    assert man.n_frames == [100, 50]


def test_batch_by_size_respects_max_tokens():
    sizes = np.array([10, 20, 30, 40, 50, 60])
    batches = batch_by_size(sizes, max_tokens=100)
    for b in batches:
        padded = sizes[b].max()
        assert len(b) * padded <= 100 or len(b) == 1
    assert sorted(np.concatenate(batches).tolist()) == list(range(6))


def test_buckets_bound_shapes():
    buckets = length_buckets(250000, min_len=32000, factor=1.5, multiple=640)
    assert all(b % 640 == 0 for b in buckets)
    assert bucket_for(33000, buckets) >= 33000
    sizes = np.random.default_rng(0).integers(32000, 250000, 100)
    batches = batch_by_size(sizes, 500000, buckets=buckets)
    shapes = {bucket_for(sizes[b].max(), buckets) for b in batches}
    assert len(shapes) <= len(buckets)


def test_epoch_iterator_shard_and_resume():
    batches = [np.array([i]) for i in range(10)]
    it = EpochBatchIterator(batches, seed=7, shard_id=0, num_shards=2)
    first = list(it.next_epoch_itr())
    assert len(first) == 5
    # resume mid-epoch
    it2 = EpochBatchIterator(batches, seed=7, shard_id=0, num_shards=2)
    g = it2.next_epoch_itr()
    next(g)
    state = it2.state_dict()
    it3 = EpochBatchIterator(batches, seed=7, shard_id=0, num_shards=2)
    it3.load_state_dict(state)
    rest = list(it3.next_epoch_itr())
    assert [b.tolist() for b in rest] == [b.tolist() for b in first[1:]]
    # different shards are disjoint
    itb = EpochBatchIterator(batches, seed=7, shard_id=1, num_shards=2)
    other = list(itb.next_epoch_itr())
    assert not ({int(b[0]) for b in first} & {int(b[0]) for b in other})


def test_tokenizers():
    w = WordTokenizer()
    assert w.encode("hello world") == ["hello", "world"]
    assert w.decode(["a", "b"]) == "a b"
    c = CharTokenizer()
    pieces = c.encode("ab cd")
    assert pieces == ["▁", "a", "b", "▁", "c", "d"]
    assert c.decode(pieces) == "ab cd"
    assert is_word_end(pieces, "▁next")
    assert not is_word_end(pieces, "suffix")


def test_fbank_shape(rng):
    wav = rng.standard_normal(16000).astype(np.float32)
    f = logmel_fbank(wav)
    assert f.shape[1] == 80
    assert abs(f.shape[0] - 98) <= 2  # ~100 frames/sec
    assert np.isfinite(f).all()


def test_instance_normalize(rng):
    wav = rng.standard_normal(4000).astype(np.float32) * 5 + 2
    n = instance_normalize(wav)
    assert abs(n.mean()) < 1e-3 and abs(n.std() - 1) < 1e-2


def test_process_local_rows_partition(monkeypatch):
    """Multi-host row sharding: the per-process slices partition the
    global batch exactly (contiguous blocks in process order)."""
    import jax
    from wav2vec_s_tpu.parallel.mesh import process_local_rows

    rows = np.arange(16)
    got = []
    for pid in range(4):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        got.append(rows[process_local_rows(len(rows))])
    assert np.concatenate(got).tolist() == rows.tolist()
    assert all(len(g) == 4 for g in got)
    # single process: identity
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    assert rows[process_local_rows(len(rows))].tolist() == rows.tolist()


def test_collate_size_hint_makes_shards_shape_consistent(tmp_path):
    """Two disjoint row slices of one global batch collate to the SAME
    padded shapes when given the global size hint (the multi-host
    contract of parallel.mesh.shard_batch)."""
    from wav2vec_s_tpu.data.audio import write_wav
    from wav2vec_s_tpu.data.dataset import CaatBatcher
    from wav2vec_s_tpu.data.dictionary import Dictionary
    from wav2vec_s_tpu.data.manifests import read_s2t_manifest
    from wav2vec_s_tpu.data.tokenizer import WordTokenizer

    rng = np.random.default_rng(0)
    lens = [3000, 9000, 4000, 12000]
    lines = ["id\taudio\tn_frames\ttgt_text"]
    for i, n in enumerate(lens):
        write_wav(tmp_path / f"u{i}.wav",
                  rng.standard_normal(n).astype(np.float32) * 0.1)
        lines.append(f"u{i}\t{tmp_path}/u{i}.wav\t{n}\tw{i} w{i}")
    tsv = tmp_path / "m.tsv"
    tsv.write_text("\n".join(lines) + "\n")
    man = read_s2t_manifest(str(tsv))
    vocab = Dictionary()
    for i in range(8):
        vocab.add_symbol(f"w{i}")
    b = CaatBatcher(man, vocab, WordTokenizer(),
                    audio_buckets=[4000, 8000, 16000])

    hint = max(lens)
    s0 = b.collate(np.asarray([0, 1]), size_hint=hint)
    s1 = b.collate(np.asarray([2, 3]), size_hint=hint)
    assert s0["source"].shape == s1["source"].shape
    assert s0["padding_mask"].shape == s1["padding_mask"].shape
    # without the hint the shard buckets diverge (9000 -> 16000 vs
    # 12000 -> 16000 happen to agree here, so check vs a small slice)
    small = b.collate(np.asarray([0, 2]))
    assert small["source"].shape[1] < s0["source"].shape[1]


def test_preprocess_builds_fairseq_dict(tmp_path):
    """fairseq-preprocess twin: counts, ordering, threshold, padding
    factor, and round-trip through Dictionary.load."""
    from wav2vec_s_tpu.data.dictionary import Dictionary
    from wav2vec_s_tpu.data.preprocess import main as pp_main

    txt = tmp_path / "corpus.txt"
    txt.write_text("a b a c\na b a\nb\n")      # a:4 b:3 c:1
    out = tmp_path / "dict.txt"
    pp_main(["--inputs", str(txt), "--tokenizer", "word",
             "--threshold", "2", "--padding-factor", "4",
             "--out", str(out)])

    d = Dictionary.load(str(out))
    # most-frequent first, c dropped by threshold
    assert d.symbols[d.nspecial:d.nspecial + 2] == ["a", "b"]
    assert "c" not in d.indices
    assert len(d) % 4 == 0                      # padding factor
    assert d.count[d.index("a")] == 4

    # manifest input path
    tsv = tmp_path / "m.tsv"
    tsv.write_text("id\taudio\tn_frames\ttgt_text\n"
                   "u0\tx.wav\t100\thello world\n"
                   "u1\ty.wav\t100\thello\n")
    out2 = tmp_path / "dict2.txt"
    pp_main(["--manifests", str(tsv), "--out", str(out2)])
    d2 = Dictionary.load(str(out2))
    assert d2.index("hello") < d2.index("world")


def test_prefetch_batches_order_and_errors():
    from wav2vec_s_tpu.data.prefetch import prefetch_batches

    calls = []

    def collate(i):
        calls.append(i)
        return i * 10

    out = list(prefetch_batches(range(7), collate, depth=2))
    assert out == [(i, i * 10) for i in range(7)]
    assert calls == list(range(7))          # order preserved

    # depth=0: pure passthrough
    out0 = list(prefetch_batches(range(3), collate, depth=0))
    assert out0 == [(i, i * 10) for i in range(3)]

    # producer exceptions surface at the consumer
    def boom(i):
        if i == 2:
            raise ValueError("bad batch")
        return i

    it = prefetch_batches(range(5), boom, depth=2)
    got = [next(it), next(it)]
    assert [g[0] for g in got] == [0, 1]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bad batch"):
        for _ in it:
            pass


def test_read_audio_batch_native_and_fallback(tmp_path):
    """Batch decode: native parallel reader for .wav, per-file python
    fallback for other formats, identical results either way."""
    from wav2vec_s_tpu.data.audio import (
        read_audio, read_audio_batch, write_wav)

    rng = np.random.default_rng(0)
    p1 = tmp_path / "a.wav"
    write_wav(p1, (rng.standard_normal(1200) * 0.3).astype(np.float32))
    p2 = tmp_path / "b.npy"
    np.save(p2, (rng.standard_normal(700) * 0.3).astype(np.float32))
    p3 = tmp_path / "c.wav"
    write_wav(p3, (rng.standard_normal(300) * 0.3).astype(np.float32))

    outs = read_audio_batch([p1, p2, p3], stride=2000)
    for o, p in zip(outs, (p1, p2, p3)):
        np.testing.assert_allclose(o, read_audio(p), atol=1e-6)

    # stride smaller than a file: that file falls back, result unchanged
    outs2 = read_audio_batch([p1, p3], stride=500)
    np.testing.assert_allclose(outs2[0], read_audio(p1), atol=1e-6)
    np.testing.assert_allclose(outs2[1], read_audio(p3), atol=1e-6)
