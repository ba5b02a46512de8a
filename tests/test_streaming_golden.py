"""Golden STREAMING-SEARCH parity vs the LIVE reference searcher.

Every earlier golden test pins *offline forwards* (extract_features, the
joint lattice).  This one pins the full streaming *search semantics*: the
reference's ``FullTransducerSearcher.search``
(rain/simul/transducer_searcher.py:103-459) driven through the real cached
``forward_infer`` encoder path + KV-cache rollback/recalc machinery
(rain/layers/unidirect_w2v2_encoder.py:332-440,
attention_transducer.py:201-287) versus our ``StreamingTransducerSearcher``
(stream/searcher.py) on shared weights and a shared chunk grid:

- same kept token prefix after every chunk (blank->eos aliasing, pool
  merge, length normalization round trips, early stop),
- same emitted words per chunk (LCP + word-boundary gating via the
  sentencepiece '▁' convention both sides),

for eager and word-gated emission and intra_beam in {2, 5}.  This was the
last major parity surface with no reference cross-check (round-4 verdict
"Missing #1").
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_torch import load_rain, reference_available
from tests.test_caat_golden import _build_reference, TINY_CONV_STR, D
from wav2vec_s_tpu.checkpoint.torch_import import import_caat_params
from wav2vec_s_tpu.data.dictionary import Dictionary as OurDictionary
from wav2vec_s_tpu.models import Wav2Vec2Config
from wav2vec_s_tpu.models.caat import CaatConfig, W2V2CaatModel
from wav2vec_s_tpu.models.feature_extractor import (
    conv_output_length, conv_receptive_stride)
from wav2vec_s_tpu.stream.engine import StreamingEngine
from wav2vec_s_tpu.stream.searcher import StreamingTransducerSearcher

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference fairseq not importable")

CONV = ((16, 10, 5), (16, 3, 2), (16, 2, 2))
MC, RC = 4, 2


def _spm_symbols(n):
    """Alternate word-initial ('▁'-marked) and continuation pieces so
    the word-boundary gate actually gates (both vocabularies use the
    fairseq index layout bos=0/pad=1/eos=2/unk=3)."""
    return [("▁w%d" % i) if i % 2 == 0 else ("c%d" % i)
            for i in range(n)]


def _reference_stack(tmp_path):
    load_rain()
    from rain.models.w2v2_transducer import W2V2TransducerModel

    encoder, decoder, dictionary, args = _build_reference(tmp_path)
    # rebuild the reference dictionary with spm-style symbols: replace the
    # non-special entries in place (the embedding table size is unchanged)
    for i, sym in enumerate(_spm_symbols(len(dictionary) - 4)):
        idx = 4 + i
        old = dictionary.symbols[idx]
        del dictionary.indices[old]
        dictionary.symbols[idx] = sym
        dictionary.indices[sym] = idx
    encoder.dictionary = dictionary       # build_model sets this normally
    model = W2V2TransducerModel(args, encoder, decoder)
    model.eval()
    return model, dictionary


def _our_stack(model_t, dictionary, prefix_lens):
    sd = {}
    for k, v in model_t.encoder.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in model_t.decoder.state_dict().items():
        sd[f"decoder.{k}"] = v
    w2v_cfg = Wav2Vec2Config(
        conv_feature_layers=CONV, extractor_mode="layer_norm",
        encoder_layers=2, encoder_embed_dim=D, encoder_ffn_embed_dim=48,
        encoder_attention_heads=4, final_dim=16, encoder_layerdrop=0.0,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        dropout_input=0.0, dropout_features=0.0,
        main_context=MC, right_context=RC, pos_type="sin",
        feature_grad_mult=1.0)
    caat_cfg = CaatConfig(
        vocab_size=len(dictionary), decoder_layers=2, decoder_embed_dim=D,
        decoder_ffn_embed_dim=48, decoder_attention_heads=4,
        jointer_layers=2, jointer_embed_dim=D, jointer_ffn_embed_dim=48,
        jointer_attention_heads=4, transducer_downsample=8,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    params = import_caat_params(sd, w2v_cfg, caat_cfg)
    model = W2V2CaatModel(w2v_cfg, caat_cfg)

    vocab = OurDictionary()
    for sym in _spm_symbols(len(dictionary) - 4):
        vocab.add_symbol(sym)
    assert len(vocab) == len(dictionary)

    engine = StreamingEngine(model, params, main_context=MC,
                             right_context=RC,
                             audio_buckets=sorted(set(prefix_lens)),
                             token_buckets=[8, 16, 32, 64])
    return engine, vocab


def _chunk_grid(n_chunks, seed=0):
    rf, hop = conv_receptive_stride(CONV)
    n = (n_chunks * MC + RC - 1) * hop + rf
    rng = np.random.default_rng(seed)
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
    window = (MC + RC - 1) * hop + rf
    stride = MC * hop
    total_frames = conv_output_length(len(wav), CONV)
    k = (total_frames - RC) // MC
    prefix_lens = [min(j * stride + window, len(wav)) for j in range(k)]
    prefix_lens[-1] = len(wav)
    return wav, prefix_lens


def _drive_reference(model_t, dictionary, searcher_mod, wav, prefix_lens,
                     intra_beam, eager, read_step, max_steps, len_scale):
    from rain.simul.transducer_agent import OnlineModels

    models = OnlineModels([model_t])
    searcher = searcher_mod.FullTransducerSearcher(
        models, dictionary, eos=dictionary.eos(), bos=dictionary.bos(),
        max_step=100, bos_bias=0.0, len_scale=len_scale, len_penalty=0.0,
        merge_add=False, eager=eager)
    searcher.eval()
    prev_tokens, prev_scores, enc_outs, inc_states = searcher.init_states()
    rows, words_per_chunk = [], []
    for k, plen in enumerate(prefix_lens):
        is_end = k == len(prefix_lens) - 1
        src = torch.from_numpy(wav[:plen]).unsqueeze(0)
        with torch.no_grad():
            prev_tokens, prev_scores, words = searcher.search(
                src, torch.tensor([plen]), prev_tokens, prev_scores,
                enc_outs, inc_states, intra_beam=intra_beam, inter_beam=1,
                gen_beam=2.0, read_step=read_step, is_end=is_end,
                max_steps=max_steps)
        row = prev_tokens[0].numpy()
        rows.append(row[row != dictionary.pad()].tolist())
        words_per_chunk.append(list(words))
    return rows, words_per_chunk


def _drive_ours(engine, vocab, wav, prefix_lens, intra_beam, eager,
                read_step, max_steps, len_scale):
    searcher = StreamingTransducerSearcher(engine, vocab, eager=eager,
                                           len_scale=len_scale)
    state = searcher.init_state()
    rows, words_per_chunk = [], []
    for k, plen in enumerate(prefix_lens):
        is_end = k == len(prefix_lens) - 1
        state, words = searcher.search(
            state, wav[:plen], is_end, intra_beam=intra_beam, inter_beam=1,
            gen_beam=2.0, read_step=read_step, max_steps=max_steps)
        row = state.prefixes[0]
        rows.append(row[row != vocab.pad()].tolist())
        words_per_chunk.append(list(words))
    return rows, words_per_chunk


@pytest.mark.parametrize("intra_beam,eager,read_step", [
    (2, True, MC),
    (5, True, 2),          # sub-block reveal loop (blocks > 1)
    (5, False, MC),        # word-boundary-gated emission
])
def test_streaming_search_matches_reference(tmp_path, intra_beam, eager,
                                            read_step):
    load_rain()
    from rain.simul import transducer_searcher as searcher_mod

    model_t, dictionary = _reference_stack(tmp_path)
    wav, prefix_lens = _chunk_grid(n_chunks=5)
    engine, vocab = _our_stack(model_t, dictionary, prefix_lens)

    max_steps, len_scale = 4, 0.7
    ref_rows, ref_words = _drive_reference(
        model_t, dictionary, searcher_mod, wav, prefix_lens, intra_beam,
        eager, read_step, max_steps, len_scale)
    got_rows, got_words = _drive_ours(
        engine, vocab, wav, prefix_lens, intra_beam, eager, read_step,
        max_steps, len_scale)

    assert got_rows == ref_rows, (
        "kept token prefixes diverge:\nref %s\nours %s"
        % (ref_rows, got_rows))
    assert got_words == ref_words, (
        "emitted words diverge:\nref %s\nours %s" % (ref_words, got_words))
    # the search emitted something real (not a trivially empty run)
    assert any(any(w) for w in ref_words)


@pytest.mark.slow
def test_streaming_search_matches_reference_base_dims(tmp_path):
    """The same chunk-for-chunk searcher pin at REAL Base dims (12x768
    encoder, 6-layer decoder/jointer, 10k vocab, mc=16/rc=8): exercises
    the convention surfaces toy dims cannot (12-head cache layouts,
    sinusoidal offsets at real frame counts, 10k-vocab top-k ties)."""
    load_rain()
    from tests.test_golden_base_dims import _build_reference_base
    from rain.models.w2v2_transducer import W2V2TransducerModel
    from rain.simul import transducer_searcher as searcher_mod

    w2v, encoder, decoder, dictionary = _build_reference_base(tmp_path)
    # spm-style symbols for the word-boundary machinery (index layout kept)
    for i, sym in enumerate(_spm_symbols(len(dictionary) - 4)):
        idx = 4 + i
        old = dictionary.symbols[idx]
        del dictionary.indices[old]
        dictionary.symbols[idx] = sym
        dictionary.indices[sym] = idx
    encoder.dictionary = dictionary
    import argparse
    args = argparse.Namespace(task_type="asr")
    model_t = W2V2TransducerModel(args, encoder, decoder)
    model_t.eval()

    # chunk grid at base mc=16/rc=8 (conv: 320x downsample, rf 400)
    from wav2vec_s_tpu.models import Wav2Vec2Config
    from wav2vec_s_tpu.models.caat import CaatConfig, W2V2CaatModel
    mc, rc = 16, 8
    n_chunks = 3
    rf, hop = 400, 320
    n = (n_chunks * mc + rc - 1) * hop + rf
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
    window = (mc + rc - 1) * hop + rf
    stride = mc * hop
    prefix_lens = [min(j * stride + window, len(wav))
                   for j in range(n_chunks)]
    prefix_lens[-1] = len(wav)

    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in decoder.state_dict().items():
        sd[f"decoder.{k}"] = v
    w2v_cfg = Wav2Vec2Config(
        encoder_layerdrop=0.0, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, dropout_input=0.0, dropout_features=0.0,
        feature_grad_mult=1.0)
    caat_cfg = CaatConfig(vocab_size=len(dictionary), dropout=0.0,
                          attention_dropout=0.0, activation_dropout=0.0)
    params = import_caat_params(sd, w2v_cfg, caat_cfg)
    model = W2V2CaatModel(w2v_cfg, caat_cfg)
    vocab = OurDictionary()
    for sym in _spm_symbols(len(dictionary) - 4):
        vocab.add_symbol(sym)
    engine = StreamingEngine(model, params, main_context=mc,
                             right_context=rc,
                             audio_buckets=sorted(set(prefix_lens)),
                             token_buckets=[8, 16, 32])

    max_steps, len_scale = 3, 0.7
    ref_rows, ref_words = _drive_reference(
        model_t, dictionary, searcher_mod, wav, prefix_lens,
        intra_beam=5, eager=True, read_step=mc, max_steps=max_steps,
        len_scale=len_scale)
    got_rows, got_words = _drive_ours(
        engine, vocab, wav, prefix_lens, intra_beam=5, eager=True,
        read_step=mc, max_steps=max_steps, len_scale=len_scale)

    assert got_rows == ref_rows, (ref_rows, got_rows)
    assert got_words == ref_words, (ref_words, got_words)
