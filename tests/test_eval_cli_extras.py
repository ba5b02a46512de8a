"""eval CLI extras: interactive streaming decode + eval-lm perplexity
(fairseq_cli/interactive.py / eval_lm.py twins), and the native BLEU
counting path (fairseq clib/libbleu twin)."""

import json

import numpy as np
import pytest

from wav2vec_s_tpu.data.audio import write_wav


pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("evalx")
    rng = np.random.default_rng(0)
    wavs = []
    for i in range(2):
        ns = 16000 // 2 + 320 * i
        wav = rng.standard_normal(ns).astype(np.float32) * 0.1
        write_wav(tmp_path / f"utt{i}.wav", wav)
        wavs.append(tmp_path / f"utt{i}.wav")

    vocab = tmp_path / "dict.txt"
    words = sorted({"guten", "tag", "welt", "hallo", "du"})
    vocab.write_text("\n".join(f"{w} 1" for w in words) + "\n")

    cfg = tmp_path / "caat.yaml"
    cfg.write_text(f"""
run:
  task: caat
  save_dir: {tmp_path}/ckpt
data:
  train_manifest: unused
  vocab: {vocab}
  tokenizer: word
context:
  main_context: 4
  right_context: 2
model:
  conv_feature_layers: [[32, 10, 5], [32, 3, 2], [32, 2, 2]]
  encoder_layers: 2
  encoder_embed_dim: 24
  encoder_ffn_embed_dim: 48
  encoder_attention_heads: 4
  final_dim: 16
  encoder_layerdrop: 0.0
caat:
  decoder_layers: 2
  decoder_embed_dim: 24
  decoder_ffn_embed_dim: 48
  decoder_attention_heads: 4
  jointer_layers: 1
  jointer_embed_dim: 24
  jointer_ffn_embed_dim: 48
  jointer_attention_heads: 4
  transducer_downsample: 4
  dropout: 0.0
""")

    # random-weight checkpoint written straight through the manager (the
    # eval CLI only needs {"params": ...})
    import jax

    from wav2vec_s_tpu.checkpoint.orbax_io import CheckpointManager
    from wav2vec_s_tpu.eval.cli import _build_caat
    from wav2vec_s_tpu.train.config import load_config

    cfg_obj = load_config(str(cfg), [])
    model, tgt_dict, model_cfg, caat_cfg = _build_caat(cfg_obj)
    src = np.zeros((1, 4000), np.float32)
    prev = np.asarray([[caat_cfg.bos, 5, 6]], np.int32)
    rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
        ["params", "dropout", "gumbel", "negatives", "layerdrop",
         "rand_pos"])}
    variables = model.init(rngs, src, prev, train=False)
    CheckpointManager(tmp_path / "ckpt").save(
        0, {"params": variables["params"]})
    return dict(tmp=tmp_path, cfg=cfg, wavs=wavs, model=model,
                params=variables["params"], caat_cfg=caat_cfg,
                tgt_dict=tgt_dict)


def test_interactive_streams_words(tiny_setup, capsys):
    from wav2vec_s_tpu.eval import cli as ecli

    inp = tiny_setup["tmp"] / "paths.txt"
    inp.write_text("\n".join(str(p) for p in tiny_setup["wavs"]) + "\n")
    ecli.main(["interactive", "--config", str(tiny_setup["cfg"]),
               "--ckpt-dir", str(tiny_setup["tmp"] / "ckpt"),
               "--input", str(inp), "--intra-beam", "1",
               "--decoder-step-read", "4",
               "--max-len-a", "0.01", "--max-len-b", "-1"])
    out = capsys.readouterr().out.splitlines()
    s_lines = [l for l in out if l.startswith("S-")]
    h_lines = [l for l in out if l.startswith("H-")]
    w_lines = [l for l in out if l.startswith("W-")]
    assert len(s_lines) == 2 and len(h_lines) == 2
    # every W- line carries a parseable consumed-ms delay and its word
    # appears in the corresponding final hypothesis
    hypos = {l.split("\t")[0][2:]: l.split("\t", 1)[1] if "\t" in l else ""
             for l in h_lines}
    for l in w_lines:
        uid, ms, w = l.split("\t")
        assert float(ms) > 0
        assert w in hypos[uid[2:]].split()


def test_sweep_emits_one_line_per_operating_point(tiny_setup, capsys):
    """eval.cli sweep = the reference eval scripts' DECISION_STEP loop
    (eval_wav2vec_s_caat_st.sh): one quality@AL record per step."""
    from wav2vec_s_tpu.eval import cli as ecli

    tsv = tiny_setup["tmp"] / "dev.tsv"
    rows = ["id\taudio\tn_frames\ttgt_text\tsrc_text"]
    for i, p in enumerate(tiny_setup["wavs"]):
        ns = 16000 // 2 + 320 * i
        rows.append(f"u{i}\t{p}\t{ns}\tguten tag\thallo du")
    tsv.write_text("\n".join(rows) + "\n")
    ecli.main(["sweep", "--config", str(tiny_setup["cfg"]),
               "--ckpt-dir", str(tiny_setup["tmp"] / "ckpt"),
               "--manifest", str(tsv), "--steps", "1,2",
               "--decoder", "oneshot", "--batch-size", "2"])
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    assert [r["step_read_blocks"] for r in out] == [1, 2]
    for r in out:
        assert "BLEU" in r and "AL" in r and r["n"] == 2


def test_eval_lm_matches_direct_nll(tiny_setup, capsys):
    import jax
    import jax.numpy as jnp

    from wav2vec_s_tpu.eval import cli as ecli
    from wav2vec_s_tpu.models.caat import W2V2CaatModel

    text = tiny_setup["tmp"] / "text.txt"
    lines = ["guten tag welt", "hallo du", "welt welt hallo"]
    text.write_text("\n".join(lines) + "\n")
    ecli.main(["eval-lm", "--config", str(tiny_setup["cfg"]),
               "--ckpt-dir", str(tiny_setup["tmp"] / "ckpt"),
               "--text", str(text), "--batch-size", "2"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["nsentences"] == 3
    assert np.isfinite(rec["perplexity"]) and rec["perplexity"] > 1.0

    # oracle: per-line NLL straight through lm_log_probs, no padding
    model, params = tiny_setup["model"], tiny_setup["params"]
    cc, d = tiny_setup["caat_cfg"], tiny_setup["tgt_dict"]
    total = ntok = 0.0
    for line in lines:
        toks = d.encode(line.split(), append_eos=True)
        prev = jnp.asarray([[cc.bos] + toks[:-1]], jnp.int32)
        tgt = jnp.asarray([toks], jnp.int32)
        lp = model.apply({"params": params}, prev,
                         method=W2V2CaatModel.lm_log_probs)
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        total += float(jnp.sum(nll))
        ntok += len(toks)
    assert rec["ntokens"] == ntok
    np.testing.assert_allclose(rec["loss"], total / ntok, rtol=2e-3)


def test_native_bleu_counts_match_python():
    from wav2vec_s_tpu import native
    from wav2vec_s_tpu.eval.bleu import _fallback_corpus_bleu, _ngrams

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    for _ in range(20):
        hyp = [str(x) for x in rng.integers(0, 6, rng.integers(1, 12))]
        ref = [str(x) for x in rng.integers(0, 6, rng.integers(1, 12))]
        m, t = native.bleu_counts(hyp, ref)
        for n in range(1, 5):
            hc, rc = _ngrams(hyp, n), _ngrams(ref, n)
            assert t[n - 1] == max(len(hyp) - n + 1, 0)
            assert m[n - 1] == sum((hc & rc).values())

    # corpus BLEU of identical corpora is 100
    hyps = ["a b c d e", "f g h i"]
    assert _fallback_corpus_bleu(hyps, hyps) == pytest.approx(100.0)


def test_score_cli_bleu_wer(tmp_path, capsys):
    """``eval.cli score`` (fairseq-score twin): corpus BLEU/WER of a sys
    file vs a ref file, stdin input, per-sentence smoothed BLEU."""
    from wav2vec_s_tpu.eval.cli import main
    from wav2vec_s_tpu.eval.bleu import sentence_bleu

    ref = tmp_path / "ref.txt"
    ref.write_text("the cat sat on the mat\nhello world\n")
    hyp = tmp_path / "sys.txt"
    hyp.write_text("the cat sat on the mat\nHELLO world\n")

    main(["score", "-s", str(hyp), "-r", str(ref), "--metric", "both"])
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["n"] == 2 and rec["BLEU"] < 100.0
    assert rec["WER"] == pytest.approx(100.0 / 8)  # corpus_wer is a percent

    # case-insensitive scoring: the corpora become identical
    main(["score", "-s", str(hyp), "-r", str(ref), "--metric", "both",
          "--ignore-case"])
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["BLEU"] == pytest.approx(100.0) and rec["WER"] == 0.0

    # per-sentence smoothed BLEU, one json line per pair
    main(["score", "-s", str(hyp), "-r", str(ref), "--sentence-bleu"])
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    got = [json.loads(ln)["BLEU"] for ln in lines]
    assert got[0] == pytest.approx(
        round(sentence_bleu("the cat sat on the mat",
                            "the cat sat on the mat"), 2))
    assert got[1] < got[0]
