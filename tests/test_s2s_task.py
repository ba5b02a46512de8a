"""Offline seq2seq fine-tuning task (reference w2v2_s2s / arch
online_w2v2_transformer_offline) + the pretrained-encoder warm start the
CAAT ST recipe builds on (train_wav2vec_s_caat_simulst_base.sh:
--pretrained-encoder-path)."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_caat import W2V_TINY, CAAT_TINY, _rngs
from wav2vec_s_tpu.models.asr import Wav2Vec2Seq2Seq
from wav2vec_s_tpu.train.recipes import make_s2s_loss_fn


import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def _setup(B=2, S=2400, U=5):
    model = Wav2Vec2Seq2Seq(W2V_TINY, CAAT_TINY)
    src = jax.random.normal(jax.random.PRNGKey(1), (B, S))
    tgt = jax.random.randint(jax.random.PRNGKey(2), (B, U), 4, 30)
    tgt = tgt.at[:, -1].set(CAAT_TINY.eos)
    tgt = tgt.at[1, 3:].set(CAAT_TINY.pad)
    tgt = tgt.at[1, 2].set(CAAT_TINY.eos)
    prev = jnp.concatenate(
        [jnp.full((B, 1), CAAT_TINY.eos, tgt.dtype), tgt[:, :-1]], 1)
    variables = model.init(_rngs(), src, prev, train=False)
    return model, variables["params"], src, tgt


def test_s2s_loss_grads_and_accuracy():
    model, params, src, tgt = _setup()
    batch = {"source": src, "targets": tgt}
    loss_fn = make_s2s_loss_fn(model, CAAT_TINY, label_smoothing=0.1)

    (loss, (n, logs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params, batch, jax.random.PRNGKey(0), 0)
    assert np.isfinite(float(loss))
    ntok = int(np.sum(np.asarray(tgt) != CAAT_TINY.pad))
    assert int(n) == ntok
    assert {"nll_loss", "n_correct", "accuracy"} <= set(logs)
    assert 0.0 <= float(logs["accuracy"]) <= 1.0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)

    # smoothing=0 reduces exactly to summed NLL
    loss0, (_, logs0) = make_s2s_loss_fn(
        model, CAAT_TINY, label_smoothing=0.0)(
            params, batch, jax.random.PRNGKey(0), 0)
    np.testing.assert_allclose(float(loss0), float(logs0["nll_loss"]),
                               rtol=1e-6)


def test_s2s_greedy_decoder_contract():
    from wav2vec_s_tpu.data.dictionary import Dictionary
    from wav2vec_s_tpu.eval.generator import make_s2s_greedy_decoder

    model, params, src, _ = _setup()
    vocab = Dictionary()
    for i in range(CAAT_TINY.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    decode = make_s2s_greedy_decoder(model, vocab, max_len=6)
    pfx, lens = decode(params, src, jnp.zeros(src.shape, bool))
    pfx, lens = np.asarray(pfx), np.asarray(lens)
    assert pfx.shape == (2, 7)
    assert (pfx[:, 0] == vocab.eos()).all()
    assert (lens >= 1).all() and (lens <= 6).all()
    for r in range(2):
        toks = pfx[r, 1:lens[r]]
        assert vocab.eos() not in toks and vocab.pad() not in toks


def test_warm_start_torch_roundtrip(tmp_path):
    """export(encoder) -> torch .pt with rain's OnlineW2V2TransformerEncoder
    naming -> load_pretrained_encoder reproduces the exact subtree."""
    from wav2vec_s_tpu.checkpoint import (
        export_wav2vec2_params, save_fairseq_checkpoint,
        load_pretrained_encoder)

    _, params, _, _ = _setup()
    enc = params["encoder"]
    sd = export_wav2vec2_params(enc, prefix="encoder.w2v2_model.")
    path = tmp_path / "asr.pt"
    save_fairseq_checkpoint(str(path), sd)
    loaded = load_pretrained_encoder(str(path), W2V_TINY)

    flat_a = jax.tree_util.tree_leaves_with_path(enc)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(loaded))
    for path_a, leaf in flat_a:
        assert path_a in flat_b, jax.tree_util.keystr(path_a)
        np.testing.assert_allclose(np.asarray(leaf, np.float32),
                                   np.asarray(flat_b[path_a], np.float32),
                                   atol=1e-6)


def test_s2s_cli_and_caat_warm_start(tmp_path, capsys):
    """Train the offline s2s stage via the CLI, then start a CAAT run from
    its checkpoint (pretrained_encoder_path) with a frozen encoder and
    check the encoder arrives bit-identical in the CAAT checkpoint."""
    from tests.test_cli_e2e import _make_audio_dir

    audio, rows = _make_audio_dir(tmp_path, n=4)
    tsv = tmp_path / "train_st.tsv"
    header = "id\taudio\tn_frames\ttgt_text\tsrc_text"
    texts = ["guten tag welt", "hallo du", "wie geht es dir", "sehr gut"]
    lines = [header] + [
        f"utt_{p}\t{audio}/{p}\t{n}\t{t}\thello world"
        for (p, n), t in zip(rows, texts)]
    tsv.write_text("\n".join(lines) + "\n")
    vocab = tmp_path / "dict.txt"
    words = sorted({w for t in texts for w in t.split()} | {"hello", "world"})
    vocab.write_text("\n".join(f"{w} 1" for w in words) + "\n")

    common = f"""
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
  lr_scheduler: inverse_sqrt
  warmup_updates: 2
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
caat:
  decoder_layers: 2
  decoder_embed_dim: 24
  decoder_ffn_embed_dim: 48
  decoder_attention_heads: 4
  jointer_layers: 2
  jointer_embed_dim: 24
  jointer_ffn_embed_dim: 48
  jointer_attention_heads: 4
  transducer_downsample: 8
  tokens_per_step: 500
  dropout: 0.1
"""
    s2s_cfg = tmp_path / "s2s.yaml"
    s2s_cfg.write_text(f"""
run:
  task: s2s
  num_devices: 2
  save_dir: {tmp_path}/ckpt_s2s
  max_update: 3
  log_interval: 1
  save_interval_updates: 3
  validate_interval_updates: 3
""" + common)

    from wav2vec_s_tpu.train import cli
    cli.main(["--config", str(s2s_cfg)])
    out = capsys.readouterr().out
    recs = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert recs
    train_recs = [r for r in recs if "loss_total" in r]
    assert train_recs and all(np.isfinite(r["loss_total"])
                              for r in train_recs)
    assert all("accuracy" in r for r in train_recs)
    vrecs = [r for r in recs if r.get("tag") == "valid"]
    # validation logs accuracy (the recipe's best-checkpoint metric)
    assert vrecs and "valid_accuracy" in vrecs[-1]
    assert 0.0 <= vrecs[-1]["valid_accuracy"] <= 1.0
    assert list((tmp_path / "ckpt_s2s").glob("step_*"))

    # CAAT fine-tune warm-started from the s2s encoder, encoder frozen so
    # the subtree must survive the update bit-identically
    caat_cfg = tmp_path / "caat.yaml"
    caat_cfg.write_text(f"""
run:
  task: caat
  num_devices: 2
  save_dir: {tmp_path}/ckpt_caat
  max_update: 1
  log_interval: 1
  save_interval_updates: 1
  pretrained_encoder_path: {tmp_path}/ckpt_s2s
  freeze_finetune_updates: 100
""" + common)
    cli.main(["--config", str(caat_cfg)])
    capsys.readouterr()

    from wav2vec_s_tpu.checkpoint import load_params_tree
    s2s_enc = load_params_tree(tmp_path / "ckpt_s2s")["encoder"]
    caat_enc = load_params_tree(tmp_path / "ckpt_caat")["encoder"]
    a = jax.tree_util.tree_leaves_with_path(s2s_enc)
    b = dict(jax.tree_util.tree_leaves_with_path(caat_enc))
    assert len(a) == len(b)
    for p, leaf in a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(b[p]),
                                      err_msg=jax.tree_util.keystr(p))
