"""Text-source CAAT (caat_transformer on text + the text transducer
agent): forward/loss/grads, decode_step parity with the offline joint,
and the greedy simultaneous agent."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_caat import W2V_TINY, CAAT_TINY, _rngs
from wav2vec_s_tpu.data.dictionary import Dictionary
from wav2vec_s_tpu.models.text_caat import TextCaatModel, TextTransducerAgent


import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def _setup():
    model = TextCaatModel(W2V_TINY, CAAT_TINY)
    src = jnp.asarray([[4, 5, 6, 7, 8, 9, 10, 11]], jnp.int32)
    tgt = jnp.asarray([[12, 13, 14, 2]], jnp.int32)
    prev = jnp.concatenate(
        [jnp.full((1, 1), CAAT_TINY.bos, jnp.int32), tgt], 1)
    variables = model.init(_rngs(), src, prev, train=False)
    return model, variables["params"], src, tgt, prev


def test_text_caat_forward_loss_grads():
    from wav2vec_s_tpu.models.caat.transducer_model import caat_loss

    model, params, src, tgt, prev = _setup()
    joint, glens = model.apply({"params": params}, src, prev, train=False)
    assert joint.shape[0] == 1 and np.isfinite(np.asarray(joint)).all()

    def loss_fn(p):
        joint, glens = model.apply(
            {"params": p}, src, prev, train=True,
            rngs={"dropout": jax.random.PRNGKey(0),
                  "rand_pos": jax.random.PRNGKey(1)})
        tl = jnp.sum(tgt != CAAT_TINY.pad, 1).astype(jnp.int32)
        loss, logs = caat_loss(joint, p["embed_tokens"], tgt, glens, tl,
                               CAAT_TINY)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the text encoder's embedding receives gradient
    g = grads["encoder"]["embed_tokens"]
    assert np.abs(np.asarray(g)).max() > 0


def test_text_decode_step_matches_offline_joint():
    model, params, src, tgt, prev = _setup()
    joint, _ = model.apply({"params": params}, src, prev, downsample=-1,
                           train=False)
    logits = jnp.einsum("...d,vd->...v", joint.astype(jnp.float32),
                        params["embed_tokens"].astype(jnp.float32))
    want = np.asarray(jax.nn.log_softmax(logits[0, 0, -1]))

    enc, enc_pad = model.apply({"params": params}, src,
                               method=TextCaatModel.encode)
    got = model.apply({"params": params}, prev,
                      jnp.asarray([prev.shape[1]], jnp.int32), enc,
                      enc_pad, method=TextCaatModel.decode_step)
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=2e-5,
                               rtol=1e-4)


def test_text_transducer_agent_streams():
    model, params, src, tgt, prev = _setup()
    vocab = Dictionary()
    for i in range(CAAT_TINY.vocab_size - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    agent = TextTransducerAgent(model, params, vocab, max_len=10,
                                max_emit_per_step=3)
    out = []
    src_list = [4, 5, 6, 7, 8]
    for i, t in enumerate(src_list):
        agent.push(t, is_end=(i == len(src_list) - 1))
        while True:
            tok = agent.pop_token()
            if tok is None:
                break
            out.append(tok)
    assert agent.finished
    assert len(out) <= 10
    assert all(v >= vocab.nspecial or v == vocab.eos() for v in out)


def test_text_caat_cli_end_to_end(tmp_path, capsys):
    """Text-family training from the CLI (data.features=text): bitext
    manifest -> TextCaatModel + caat loss + validation BLEU (the
    reference's dropout_translation / text transducer task)."""
    import json

    srcs = ["hello world now", "good morning", "see you soon", "thanks a lot"]
    tgts = ["hallo welt jetzt", "guten morgen", "bis bald", "danke sehr"]
    tsv = tmp_path / "train_mt.tsv"
    tsv.write_text("id\tsrc_text\ttgt_text\n" + "\n".join(
        f"{i}\t{s}\t{t}" for i, (s, t) in enumerate(zip(srcs, tgts))) + "\n")
    vocab = tmp_path / "dict.txt"
    words = sorted({w for t in srcs + tgts for w in t.split()})
    vocab.write_text("\n".join(f"{w} 1" for w in words) + "\n")

    cfg = tmp_path / "text_caat.yaml"
    cfg.write_text(f"""
run:
  task: caat
  num_devices: 2
  save_dir: {tmp_path}/ckpt_text
  max_update: 3
  log_interval: 1
  save_interval_updates: 3
  validate_interval_updates: 3
  debug_nan: true
  eval_bleu: true
data:
  train_manifest: {tsv}
  valid_manifest: {tsv}
  vocab: {vocab}
  tokenizer: word
  features: text
  max_tokens: 64
context:
  main_context: 4
  right_context: 2
model:
  encoder_layers: 2
  encoder_embed_dim: 24
  encoder_ffn_embed_dim: 48
  encoder_attention_heads: 4
  encoder_layerdrop: 0.0
caat:
  decoder_layers: 2
  decoder_embed_dim: 24
  decoder_ffn_embed_dim: 48
  decoder_attention_heads: 4
  jointer_layers: 2
  jointer_embed_dim: 24
  jointer_ffn_embed_dim: 48
  jointer_attention_heads: 4
  transducer_downsample: 2
  step_mode: constant
  tokens_per_step: 500
  dropout: 0.1
optim:
  lr: 0.001
  lr_scheduler: inverse_sqrt
  warmup_updates: 2
  clip_norm: 2.0
""")
    from wav2vec_s_tpu.train import cli
    cli.main(["--config", str(cfg)])
    out = capsys.readouterr().out
    recs = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert recs
    assert all(np.isfinite(r["loss_total"]) for r in recs
               if "loss_total" in r)
    vrecs = [r for r in recs if r.get("tag") == "valid"]
    assert vrecs and "valid_bleu" in vrecs[-1], vrecs
    assert list((tmp_path / "ckpt_text").glob("step_*"))
