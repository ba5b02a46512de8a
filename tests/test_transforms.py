import numpy as np

from wav2vec_s_tpu.data.transforms import Whiten, TFMask


def test_whiten_per_utt(rng):
    f = rng.standard_normal((50, 80)).astype(np.float32) * 3 + 1
    w = Whiten()(f)
    assert abs(w.mean()) < 1e-2 and abs(w.std() - 1) < 5e-2


def test_whiten_global_stats(rng):
    f = rng.standard_normal((50, 4)).astype(np.float32)
    mean = np.ones(4, np.float32)
    std = np.full(4, 2.0, np.float32)
    w = Whiten(mean, std)(f)
    np.testing.assert_allclose(w, (f - 1) / 2, rtol=1e-5)


def test_tfmask_masks_something(rng):
    f = rng.standard_normal((100, 80)).astype(np.float32)
    out = TFMask(seed=3)(f)
    assert out.shape == f.shape
    assert (out != f).any()
    assert np.isfinite(out).all()
