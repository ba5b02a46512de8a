"""fbank-family streaming inference (SURVEY §2.3's last partial rows):
chunked carry-over feature extraction + the fbank agent through the same
SimulEvaluator stack as the w2v2 path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2vec_s_tpu.data.audio import logmel_fbank
from wav2vec_s_tpu.data.dictionary import Dictionary
from wav2vec_s_tpu.models import Wav2Vec2Config
from wav2vec_s_tpu.models.caat import CaatConfig
from wav2vec_s_tpu.models.fbank import FbankCaatModel
from wav2vec_s_tpu.stream.agent import (
    AgentConfig, SimulEvaluator, SpeechTransducerAgent)
from wav2vec_s_tpu.stream.fbank_engine import (
    FbankStreamingEngine, IncrementalFbank)
from wav2vec_s_tpu.stream.searcher import StreamingTransducerSearcher


@pytest.mark.parametrize("chunks", [
    [400, 160, 160, 1000],
    [100, 100, 100, 100, 5000],
    [4000],
])
def test_incremental_fbank_matches_offline(chunks, rng):
    wav = rng.standard_normal(sum(chunks)).astype(np.float32)
    inc = IncrementalFbank()
    parts = [inc.push(wav[a - c:a]) for a, c in
             zip(np.cumsum(chunks), chunks)]
    got = np.concatenate([p for p in parts if len(p)])
    want = logmel_fbank(wav)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def _tiny_fbank_stack():
    enc_cfg = Wav2Vec2Config(
        encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=4, encoder_layerdrop=0.0,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        main_context=4, right_context=2, layer_norm_first=True)
    caat_cfg = CaatConfig(
        vocab_size=16, decoder_layers=1, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, decoder_attention_heads=4,
        jointer_layers=1, jointer_embed_dim=32, jointer_ffn_embed_dim=64,
        jointer_attention_heads=4, transducer_downsample=4,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    model = FbankCaatModel(enc_cfg, caat_cfg, conv_type="shallow2d",
                           jointer_type="mha")
    feats = jnp.zeros((1, 64, 80))
    prev = jnp.asarray([[caat_cfg.bos, 5]], jnp.int32)
    rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
        ["params", "dropout", "rand_pos"])}
    params = model.init(rngs, feats, prev, train=False)["params"]
    vocab = Dictionary()
    for i in range(16 - vocab.nspecial):
        vocab.add_symbol(f"w{i}")
    return model, params, enc_cfg, caat_cfg, vocab


def test_fbank_agent_streams_through_simul_evaluator(rng):
    """The fbank agent runs the full policy loop end-to-end: emissions
    appear with populated delays and latency metrics — the same eval
    surface as the w2v2 path (VERDICT round-3 missing row #2)."""
    model, params, enc_cfg, caat_cfg, vocab = _tiny_fbank_stack()
    engine = FbankStreamingEngine(model, params, main_context=4,
                                  right_context=2)
    searcher = StreamingTransducerSearcher(engine, vocab)
    cfg = AgentConfig(main_context=4, right_context=2,
                      frame_samples=160 * engine.subsample,
                      step_read_blocks=2, intra_beam=2, inter_beam=1,
                      eager=True, max_len_a=0.2, max_len_b=-1.0)
    ev = SimulEvaluator(lambda: SpeechTransducerAgent(searcher, cfg),
                        segment_size_ms=25)
    wavs = [rng.standard_normal(16000).astype(np.float32) * 0.3
            for _ in range(2)]
    refs = ["w1 w2", "w3"]
    out = ev.evaluate(wavs, refs, metric="wer")
    assert {"AL", "AP", "DAL", "AL_CA", "WER"} <= set(out)
    assert np.isfinite(out["AL"]) and np.isfinite(out["WER"])
    assert out["num_instances"] == 2


def test_fbank_engine_streaming_prefix_consistency(rng):
    """Frames already revealed must not change as more audio arrives
    (blockwise causality through the feature + encode path)."""
    model, params, enc_cfg, caat_cfg, vocab = _tiny_fbank_stack()
    engine = FbankStreamingEngine(model, params, main_context=4,
                                  right_context=2)
    wav = rng.standard_normal(16080).astype(np.float32)
    enc1, t1 = engine.encode_prefix(wav[:7920], finished=False)
    enc2, t2 = engine.encode_prefix(wav, finished=True)
    assert t2 > t1 > 0
    # fully-safe region: blocks whose rc look-ahead was completely inside
    # the prefix (the rc trim still exposes part of the last block, which
    # legitimately refines as audio arrives — reference semantics:
    # unidirect encoders trim exactly rc, unidirect_w2v2_encoder.py:326)
    t_conv = 48 // engine.subsample          # 7920 samples -> 48 fbank fr
    safe = ((t_conv - engine.rc) // engine.mc) * engine.mc
    assert 0 < safe <= t1
    np.testing.assert_allclose(enc1[:safe], enc2[:safe], atol=2e-4,
                               rtol=1e-3)
