"""Native C++ helpers vs python references."""

import numpy as np
import pytest

from wav2vec_s_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("g++ build unavailable")
    return True


def test_levenshtein(lib_ok):
    assert native.levenshtein(list("kitten"), list("sitting")) == 3
    assert native.levenshtein([], ["a"]) == 1
    assert native.levenshtein(["a", "b"], ["a", "b"]) == 0


def test_levenshtein_matches_python(lib_ok, rng):
    import importlib
    wer_mod = importlib.import_module("wav2vec_s_tpu.eval.wer")
    for _ in range(20):
        a = [str(x) for x in rng.integers(0, 5, rng.integers(0, 12))]
        b = [str(x) for x in rng.integers(0, 5, rng.integers(0, 12))]
        # call the pure-python DP directly
        native_d = native.levenshtein(a, b)
        saved = wer_mod._native_lev
        wer_mod._native_lev = None
        try:
            py_d = wer_mod.levenshtein(a, b)
        finally:
            wer_mod._native_lev = saved
        assert native_d == py_d


def test_batch_offsets(lib_ok):
    sizes = np.array([10, 10, 20, 30, 100], np.int64)
    offs = native.batch_offsets(sizes, max_tokens=60)
    batches = np.split(np.arange(len(sizes)), offs[:-1])
    # every batch respects cost = count * max_size <= 60 (or singleton)
    for b in batches:
        if len(b):
            assert len(b) * sizes[b].max() <= 60 or len(b) == 1
    assert offs[-1] == len(sizes)


def test_bleu_counts(lib_ok):
    m, t = native.bleu_counts("the cat sat".split(), "the cat sat".split())
    assert m.tolist() == [3, 2, 1, 0]
    assert t.tolist() == [3, 2, 1, 0]
    m, t = native.bleu_counts("a a a".split(), "a".split())
    assert m[0] == 1 and t[0] == 3  # clipped counts
