"""CTC fine-tuning task (reference fairseq wav2vec2_asr.py:154 Wav2VecCtc +
criterions/ctc.py): loss recipe, in-graph argmax decoder, CLI e2e with WER
validation."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_caat import W2V_TINY
from wav2vec_s_tpu.models.asr import Wav2VecCtc, ctc_greedy_decode
from wav2vec_s_tpu.train.recipes import make_ctc_loss_fn

PAD, EOS, BLANK = 1, 2, 0


import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def _setup(B=2, S=2400, V=30):
    model = Wav2VecCtc(W2V_TINY, vocab_size=V)
    src = jax.random.normal(jax.random.PRNGKey(1), (B, S))
    tgt = jax.random.randint(jax.random.PRNGKey(2), (B, 5), 4, V)
    tgt = tgt.at[:, -1].set(EOS)
    tgt = tgt.at[1, 3:].set(PAD)
    tgt = tgt.at[1, 2].set(EOS)
    rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
        ["params", "dropout", "layerdrop"])}
    params = model.init(rngs, src, train=False)["params"]
    return model, params, src, tgt


def test_ctc_loss_fn_grads_and_ntokens():
    model, params, src, tgt = _setup()
    loss_fn = make_ctc_loss_fn(model, pad=PAD, eos=EOS, blank=BLANK)
    (loss, (n, logs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, {"source": src, "targets": tgt}, jax.random.PRNGKey(0), 0)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # eos + pad excluded from the label count
    expect = int(np.sum((np.asarray(tgt) != PAD) & (np.asarray(tgt) != EOS)))
    assert int(n) == expect
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_ctc_greedy_decoder_matches_host_decode():
    from wav2vec_s_tpu.data.dictionary import Dictionary
    from wav2vec_s_tpu.eval.generator import make_ctc_greedy_decoder

    model, params, src, _ = _setup()
    vocab = Dictionary()
    for i in range(30 - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    decode = make_ctc_greedy_decoder(model, vocab, blank=BLANK)
    pad_mask = jnp.zeros(src.shape, bool).at[1, 1800:].set(True)
    pfx, lens = decode(params, src, pad_mask)
    pfx, lens = np.asarray(pfx), np.asarray(lens)
    assert (pfx[:, 0] == vocab.eos()).all()

    logits, lpad = model.apply({"params": params}, src,
                               padding_mask=pad_mask, train=False)
    host = ctc_greedy_decode(logits, lpad, blank=BLANK)
    for r in range(2):
        assert list(pfx[r, 1:lens[r]]) == host[r]


def test_ctc_cli_end_to_end(tmp_path, capsys):
    """Train via the CLI with eval_wer on: finite loss, valid_wer logged,
    checkpoint written."""
    from tests.test_cli_e2e import _make_audio_dir

    audio, rows = _make_audio_dir(tmp_path, n=4)
    tsv = tmp_path / "train_asr.tsv"
    header = "id\taudio\tn_frames\ttgt_text\tsrc_text"
    texts = ["hello world", "good day", "how are you", "very well"]
    lines = [header] + [
        f"utt_{p}\t{audio}/{p}\t{n}\t{t}\t{t}"
        for (p, n), t in zip(rows, texts)]
    tsv.write_text("\n".join(lines) + "\n")
    vocab = tmp_path / "dict.txt"
    words = sorted({w for t in texts for w in t.split()})
    vocab.write_text("\n".join(f"{w} 1" for w in words) + "\n")

    cfg = tmp_path / "ctc.yaml"
    cfg.write_text(f"""
run:
  task: ctc
  num_devices: 2
  save_dir: {tmp_path}/ckpt_ctc
  max_update: 3
  log_interval: 1
  save_interval_updates: 3
  validate_interval_updates: 3
  eval_wer: true
  final_dropout: 0.1
data:
  train_manifest: {tsv}
  valid_manifest: {tsv}
  vocab: {vocab}
  tokenizer: word
  max_tokens: 40000
  max_sample_size: 12800
  task_type: asr
optim:
  lr: 0.001
  lr_scheduler: tri_stage
  warmup_updates: 1
  total_updates: 10
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
  feature_grad_mult: 1.0
""")
    from wav2vec_s_tpu.train import cli
    cli.main(["--config", str(cfg)])
    out = capsys.readouterr().out
    recs = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    train_recs = [r for r in recs if "loss_total" in r]
    assert train_recs and all(np.isfinite(r["loss_total"])
                              for r in train_recs)
    vrecs = [r for r in recs if r.get("tag") == "valid"]
    assert vrecs and "valid_wer" in vrecs[-1]
    assert vrecs[-1]["valid_wer"] >= 0.0
    assert list((tmp_path / "ckpt_ctc").glob("step_*"))

    # offline decode CLI over the trained checkpoint
    from wav2vec_s_tpu.eval import cli as ecli
    ecli.main(["ctc-decode", "--config", str(cfg),
               "--ckpt-dir", str(tmp_path / "ckpt_ctc"),
               "--manifest", str(tsv), "--batch-size", "2"])
    out = capsys.readouterr().out
    recs = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert "WER" in recs[-1] and recs[-1]["n"] == 4
    assert all("hypo" in r for r in recs[:-1])
