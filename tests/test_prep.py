"""Data-prep CLI + segment audio decode.

Covers the reference's preprocess scripts
(wav2vec_s_scripts/preprocess/*, fairseq examples
prep_mustc_data_raw.py) and the ``<wav>:<sample offset>:<n samples>``
audio-segment syntax those manifests rely on
(get_segment_waveform, fairseq/fairseq/data/audio/audio_utils.py:38-54).
"""

import wave

import numpy as np
import pytest

from wav2vec_s_tpu.data.audio import read_audio
from wav2vec_s_tpu.data.manifests import (read_audio_manifest,
                                          read_s2t_manifest)
from wav2vec_s_tpu.data.prep import main as prep_main


def _write_wav(path, samples, rate=16000):
    data = (np.asarray(samples) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(data.tobytes())


def test_wav_sample_segment_decode(tmp_path):
    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.5, 0.5, 4000).astype(np.float32)
    path = tmp_path / "long.wav"
    _write_wav(path, wav)

    full = read_audio(path)
    seg = read_audio(f"{path}:1000:800")
    assert seg.shape == (800,)
    np.testing.assert_allclose(seg, full[1000:1800], atol=1e-4)

    # segment reads clamp at EOF like soundfile does
    tail = read_audio(f"{path}:3500:800")
    assert tail.shape == (500,)


def _fake_librispeech(root, split="train-clean-100"):
    texts = {}
    for spk, chap in [("19", "198"), ("26", "495")]:
        d = root / split / spk / chap
        d.mkdir(parents=True)
        lines = []
        for utt in range(2):
            uid = f"{spk}-{chap}-{utt:04d}"
            n = 1600 + 160 * utt
            _write_wav(d / f"{uid}.wav",
                       np.linspace(-0.1, 0.1, n).astype(np.float32))
            text = f"HELLO WORLD {spk} {utt}"
            texts[uid] = text
            lines.append(f"{uid} {text}")
        (d / f"{spk}-{chap}.trans.txt").write_text("\n".join(lines) + "\n")
    return texts


def test_prep_librispeech_and_s2t(tmp_path):
    root = tmp_path / "LibriSpeech"
    out = tmp_path / "manifests"
    texts = _fake_librispeech(root)
    rc = prep_main(["librispeech", str(root), "--split", "train-clean-100",
                    "--out", str(out), "--ext", "wav"])
    assert rc == 0

    man = read_audio_manifest(out / "train-clean-100.tsv")
    assert len(man) == 4
    assert man.sizes[0] == 1600
    wav = read_audio(man.full_path(0))
    assert wav.shape == (1600,)

    words = (out / "train-clean-100.wrd").read_text().splitlines()
    assert words[0] == texts["19-198-0000"]
    ltr = (out / "train-clean-100.ltr").read_text().splitlines()
    assert ltr[0].endswith(" |") and "|" in ltr[0]
    assert ltr[0].split() == list(texts["19-198-0000"].replace(" ", "|")) + ["|"]

    # stage 2: S2T tsv (process_librispeech_raw_data.py twin)
    tsv = out / "train_asr.tsv"
    cfg = out / "config_asr.yaml"
    rc = prep_main(["s2t", "--manifest", str(out / "train-clean-100.tsv"),
                    "--wrd", str(out / "train-clean-100.wrd"),
                    "--out", str(tsv), "--config-out", str(cfg)])
    assert rc == 0
    m = read_s2t_manifest(tsv)
    assert len(m) == 4
    assert m.ids[0] == "librispeech_19_19-198-0000"
    assert m.tgt_texts[0] == m.src_texts[0] == texts["19-198-0000"]
    assert m.n_frames[0] == 1600
    assert read_audio(m.audio_paths[0]).shape == (1600,)

    from wav2vec_s_tpu.data.manifests import S2TDataConfig
    dc = S2TDataConfig.from_yaml(cfg)
    assert dc.vocab_filename == "dict.txt" and dc.use_audio_input


def test_prep_mustc(tmp_path):
    yaml = pytest.importorskip("yaml")
    root = tmp_path / "mustc"
    d = root / "en-de" / "data" / "dev"
    (d / "txt").mkdir(parents=True)
    (d / "wav").mkdir()

    rate = 16000
    rng = np.random.default_rng(1)
    long_wav = rng.uniform(-0.5, 0.5, 3 * rate).astype(np.float32)
    _write_wav(d / "wav" / "ted_1.wav", long_wav, rate)

    segs = [
        {"wav": "ted_1.wav", "offset": "0.25", "duration": "1.0",
         "speaker_id": "spk_1"},
        {"wav": "ted_1.wav", "offset": "1.5", "duration": "0.5",
         "speaker_id": "spk_1"},
    ]
    with open(d / "txt" / "dev.yaml", "w") as f:
        yaml.safe_dump(segs, f)
    (d / "txt" / "dev.en").write_text("hello there\nsecond line\n")
    (d / "txt" / "dev.de").write_text("hallo du\nzweite zeile\n")

    rc = prep_main(["mustc", str(root), "--lang", "de", "--splits", "dev"])
    assert rc == 0

    m = read_s2t_manifest(root / "en-de" / "dev_st_raw.tsv")
    assert len(m) == 2
    assert m.ids == ["ted_1_0", "ted_1_1"]
    assert m.tgt_texts == ["hallo du", "zweite zeile"]
    assert m.n_frames[0] == rate  # 1.0 s

    seg = read_audio(m.audio_paths[0])
    start = int(0.25 * rate)
    np.testing.assert_allclose(seg, long_wav[start:start + rate], atol=1e-4)
