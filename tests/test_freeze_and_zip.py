"""Freeze schedules + zip byte-range audio."""

import numpy as np
import jax
import jax.numpy as jnp

from wav2vec_s_tpu.data.audio import read_audio, write_wav
from wav2vec_s_tpu.train.recipes import make_freeze_mask


def test_zip_byte_range_audio(tmp_path, rng):
    wav = (rng.standard_normal(800) * 0.3).astype(np.float32)
    write_wav(tmp_path / "inner.wav", wav)
    blob = (tmp_path / "inner.wav").read_bytes()
    container = tmp_path / "all.zip"
    container.write_bytes(b"JUNKHEADER" + blob + b"TRAILER")
    path = f"{container}:10:{len(blob)}"
    back = read_audio(path)
    np.testing.assert_allclose(back, np.clip(wav, -1, 1), atol=6e-5)


def test_zip_byte_range_npy(tmp_path, rng):
    arr = rng.standard_normal(64).astype(np.float32)
    np.save(tmp_path / "a.npy", arr)
    blob = (tmp_path / "a.npy").read_bytes()
    container = tmp_path / "c.bin"
    container.write_bytes(blob)
    back = read_audio(f"{container}:0:{len(blob)}")
    np.testing.assert_array_equal(back, arr)


def _grads_template():
    return {
        "encoder": {
            "feature_extractor": {"conv_0": {"kernel": jnp.ones((3, 1, 4))}},
            "encoder": {"layers": {
                "layer_0": {"fc1": {"kernel": jnp.ones((4, 8))}},
                "layer_1": {"fc1": {"kernel": jnp.ones((4, 8))}},
            }},
        },
        "decoder_lm": {"layer_0": {"fc1": {"kernel": jnp.ones((4, 8))}}},
    }


def test_freeze_finetune_updates_gates_encoder():
    mask = make_freeze_mask(freeze_finetune_updates=10)
    g = _grads_template()
    early = mask(g, jnp.asarray(5))
    late = mask(g, jnp.asarray(20))
    assert np.all(np.asarray(
        early["encoder"]["feature_extractor"]["conv_0"]["kernel"]) == 0)
    assert np.all(np.asarray(early["decoder_lm"]["layer_0"]["fc1"]["kernel"])
                  == 1)
    assert np.all(np.asarray(
        late["encoder"]["encoder"]["layers"]["layer_0"]["fc1"]["kernel"]) == 1)


def test_freeze_w2v2_enc_layers():
    mask = make_freeze_mask(freeze_w2v2_enc=1)
    out = mask(_grads_template(), jnp.asarray(100))
    enc = out["encoder"]["encoder"]["layers"]
    assert np.all(np.asarray(enc["layer_0"]["fc1"]["kernel"]) == 0)
    assert np.all(np.asarray(enc["layer_1"]["fc1"]["kernel"]) == 1)
    assert np.all(np.asarray(
        out["encoder"]["feature_extractor"]["conv_0"]["kernel"]) == 0)
    assert np.all(np.asarray(out["decoder_lm"]["layer_0"]["fc1"]["kernel"])
                  == 1)
