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


def test_fbank_collate_applies_transforms(tmp_path):
    """The fbank batcher applies Whiten/TFMask in order; the validation
    replacement strips TFMask but keeps Whiten (train/cli.py contract)."""
    import numpy as np

    from wav2vec_s_tpu.data.audio import write_wav
    from wav2vec_s_tpu.data.dataset import CaatBatcher
    from wav2vec_s_tpu.data.dictionary import Dictionary
    from wav2vec_s_tpu.data.manifests import read_s2t_manifest
    from wav2vec_s_tpu.data.tokenizer import WordTokenizer
    from wav2vec_s_tpu.data.transforms import TFMask, Whiten

    rng = np.random.default_rng(0)
    write_wav(tmp_path / "u0.wav",
              (rng.standard_normal(8000) * 0.1).astype(np.float32))
    tsv = tmp_path / "m.tsv"
    tsv.write_text("id\taudio\tn_frames\ttgt_text\n"
                   f"u0\t{tmp_path}/u0.wav\t8000\thello\n")
    man = read_s2t_manifest(str(tsv))
    vocab = Dictionary()
    vocab.add_symbol("hello")
    kw = dict(tgt_dict=vocab, tokenizer=WordTokenizer(),
              audio_buckets=[64, 128], features="fbank")

    plain = CaatBatcher(man, **kw)
    whiten = CaatBatcher(man, transforms=(Whiten(),), **kw)
    masked = CaatBatcher(
        man, transforms=(Whiten(), TFMask(max_time=20, seed=3)), **kw)

    b0 = plain.collate(np.asarray([0]))["source"]
    b1 = whiten.collate(np.asarray([0]))["source"]
    b2 = masked.collate(np.asarray([0]))["source"]
    assert not np.allclose(b0, b1)           # whitening changed the feats
    # whitened (non-pad) frames are ~zero-mean
    T = (~plain.collate(np.asarray([0]))["padding_mask"][0]).sum()
    assert abs(b1[0, :T].mean()) < 0.1
    assert not np.allclose(b1, b2)           # masking changed something

    # validation strip: TFMask removed, Whiten kept
    from wav2vec_s_tpu.train.cli import dataclasses_replace_manifest
    v = dataclasses_replace_manifest(masked, man)
    assert any(isinstance(t, Whiten) for t in v.transforms)
    assert not any(isinstance(t, TFMask) for t in v.transforms)
