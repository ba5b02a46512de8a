"""Evaluation CLI.

Subcommands re-providing the reference's eval entry points:

- ``average``  ~ fairseq/scripts/average_checkpoints.py (invoked by
  wav2vec_s_scripts/eval/eval_wav2vec_s_caat_st.sh:17-21)
- ``generate`` ~ fairseq-generate / fairseq_cli/generate.py (offline decode
  + WER/BLEU)
- ``simul``    ~ the SimulEval harness run (simuleval CLI): streaming decode
  with AL/AP/DAL + quality, in-process
- ``interactive`` ~ fairseq-interactive (fairseq_cli/interactive.py):
  stdin-driven streaming decode, words printed as they are emitted
- ``eval-lm``  ~ fairseq-eval-lm (fairseq_cli/eval_lm.py): perplexity of
  the decoupled CAAT decoder as a language model
- ``ctc-decode`` ~ fairseq's argmax/viterbi WER eval for ``Wav2VecCtc``
  checkpoints trained with ``run.task: ctc``
- ``sweep``    ~ the eval scripts' DECISION_STEP loop
  (eval_wav2vec_s_caat_st.sh): batched quality@AL over operating points
- ``score``    ~ fairseq-score (fairseq_cli/score.py): BLEU/WER of a
  system-output file against a reference file

Usage:
  python -m wav2vec_s_tpu.eval.cli average --ckpt-dir D --k 5 --out avg.npz
  python -m wav2vec_s_tpu.eval.cli simul --config train.yaml --ckpt-dir D \
      --manifest dev.tsv [--step-read-blocks 2] [--metric bleu|wer]
  python -m wav2vec_s_tpu.eval.cli generate --config train.yaml \
      --ckpt-dir D --manifest dev.tsv
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np
import jax


def _load_params(ckpt_dir: str, average_k: int = 0):
    from wav2vec_s_tpu.checkpoint.orbax_io import (
        CheckpointManager, average_last_checkpoints)

    mgr = CheckpointManager(ckpt_dir, keep_last=0)
    if average_k > 1:
        return average_last_checkpoints(ckpt_dir, average_k)
    state, _ = mgr.restore()
    if state is None:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    return state["params"] if isinstance(state, dict) else state.params


def _build_caat(cfg):
    from wav2vec_s_tpu.data import Dictionary
    from wav2vec_s_tpu.models import Wav2Vec2Config
    from wav2vec_s_tpu.models.caat import CaatConfig, W2V2CaatModel

    tgt_dict = Dictionary.load(cfg.data.vocab)
    model_cfg = Wav2Vec2Config(
        main_context=cfg.context.main_context,
        right_context=cfg.context.right_context,
        context_type="constant", **cfg.model)
    caat_cfg = CaatConfig(vocab_size=len(tgt_dict), **cfg.caat)
    return W2V2CaatModel(model_cfg, caat_cfg), tgt_dict, model_cfg, caat_cfg


def cmd_average(args):
    params = _load_params(args.ckpt_dir, args.k)
    flat = jax.tree_util.tree_leaves_with_path(params)
    np.savez(args.out, **{jax.tree_util.keystr(p): np.asarray(v)
                          for p, v in flat})
    print(f"averaged {args.k} checkpoints -> {args.out} "
          f"({len(flat)} tensors)", file=sys.stderr)


def _agent_factory(args, cfg):
    from wav2vec_s_tpu.data.tokenizer import build_tokenizer
    from wav2vec_s_tpu.stream.agent import AgentConfig, SpeechTransducerAgent
    from wav2vec_s_tpu.stream.searcher import StreamingTransducerSearcher

    fbank = getattr(cfg.data, "features", "raw") == "fbank"
    params = _load_params(args.ckpt_dir, args.average_k)
    if fbank:
        # fbank CAAT family streams through the same agent/searcher with
        # the chunked carry-over feature engine (rain TransducerAgent /
        # OnlineSpeechModels, transducer_agent.py:170-614)
        from wav2vec_s_tpu.data import Dictionary
        from wav2vec_s_tpu.models import Wav2Vec2Config
        from wav2vec_s_tpu.models.caat import CaatConfig
        from wav2vec_s_tpu.models.fbank import FbankCaatModel
        from wav2vec_s_tpu.stream.fbank_engine import FbankStreamingEngine

        tgt_dict = Dictionary.load(cfg.data.vocab)
        model_cfg = Wav2Vec2Config(
            main_context=cfg.context.main_context,
            right_context=cfg.context.right_context,
            context_type="constant", **cfg.model)
        caat_cfg = CaatConfig(vocab_size=len(tgt_dict), **cfg.caat)
        model = FbankCaatModel(model_cfg, caat_cfg,
                               conv_type=caat_cfg.frontend,
                               jointer_type=caat_cfg.jointer_type)
        engine = FbankStreamingEngine(
            model, params, main_context=cfg.context.main_context,
            right_context=cfg.context.right_context)
        frame_samples = 160 * engine.subsample
    else:
        from wav2vec_s_tpu.stream.engine import StreamingEngine

        model, tgt_dict, model_cfg, caat_cfg = _build_caat(cfg)
        engine = StreamingEngine(model, params,
                                 main_context=cfg.context.main_context,
                                 right_context=cfg.context.right_context)
        frame_samples = 320
    tokenizer = None
    if cfg.data.tokenizer != "word":
        tokenizer = build_tokenizer(cfg.data.tokenizer,
                                    cfg.data.spm_model or None)
    searcher = StreamingTransducerSearcher(
        engine, tgt_dict, tokenizer,
        len_scale=args.len_scale, eager=args.eager)
    agent_cfg = AgentConfig(
        main_context=cfg.context.main_context,
        right_context=cfg.context.right_context,
        frame_samples=frame_samples,
        step_read_blocks=args.step_read_blocks,
        intra_beam=args.intra_beam, inter_beam=args.inter_beam,
        decoder_step_read=args.decoder_step_read, eager=args.eager,
        max_len_a=args.max_len_a, max_len_b=args.max_len_b,
        len_scale=args.len_scale)
    return lambda: SpeechTransducerAgent(searcher, agent_cfg)


def cmd_simul(args):
    from wav2vec_s_tpu.data import read_s2t_manifest
    from wav2vec_s_tpu.data.audio import read_audio
    from wav2vec_s_tpu.stream.agent import SimulEvaluator
    from wav2vec_s_tpu.train.config import load_config

    cfg = load_config(args.config, args.overrides)
    man = read_s2t_manifest(args.manifest, cfg.data.audio_root)
    n = min(len(man.ids), args.max_instances or len(man.ids))
    wavs = [read_audio(man.audio_paths[i]) for i in range(n)]
    refs = [man.tgt_texts[i] if args.metric == "bleu"
            else (man.src_texts[i] or man.tgt_texts[i]) for i in range(n)]

    factory = _agent_factory(args, cfg)
    ev = SimulEvaluator(factory, segment_size_ms=args.segment_size)
    scores = ev.evaluate(wavs, refs, metric=args.metric)
    print(json.dumps(scores))


def cmd_batch_decode(args):
    """Batched streaming decode of a corpus — the throughput path.

    ``--decoder`` picks the engine: ``fused``/``cached`` stream through the
    O(T) incremental encoder (serving semantics); ``oneshot`` encodes each
    utterance once and replays the decision loop (corpus-eval fast path,
    emission-identical); ``beam``/``oneshot-beam`` are the quality twins at
    ``--intra-beam``.  Utterances are length-sorted into ``--batch-size``
    buckets so one executable serves each batch shape."""
    from wav2vec_s_tpu.data import read_s2t_manifest
    from wav2vec_s_tpu.data.audio import read_audio
    from wav2vec_s_tpu.eval.bleu import corpus_bleu
    from wav2vec_s_tpu.eval.wer import corpus_wer
    from wav2vec_s_tpu.models.feature_extractor import conv_output_length
    from wav2vec_s_tpu.stream.batched import (
        CachedFusedGreedyDecoder, FusedIncrementalGreedyDecoder,
        OneShotCorpusDecoder)
    from wav2vec_s_tpu.stream.beam_batched import (
        BatchedBeamStreamingDecoder, FusedBeamStreamingDecoder,
        FusedOneShotBeamDecoder, OneShotBeamDecoder)
    from wav2vec_s_tpu.stream.latency import average_lagging
    from wav2vec_s_tpu.train.config import load_config

    cfg = load_config(args.config, args.overrides)
    model, tgt_dict, model_cfg, caat_cfg = _build_caat(cfg)
    params = _load_params(args.ckpt_dir, args.average_k)
    man = read_s2t_manifest(args.manifest, cfg.data.audio_root)
    n = min(len(man.ids), args.max_instances or len(man.ids))
    wavs = [read_audio(man.audio_paths[i]) for i in range(n)]
    refs = [man.tgt_texts[i] if args.metric == "bleu"
            else (man.src_texts[i] or man.tgt_texts[i]) for i in range(n)]

    frames = conv_output_length(max(len(w) for w in wavs),
                                model_cfg.conv_feature_layers)
    t_cap = -(-(frames + model_cfg.right_context) // 128) * 128
    greedy_kw = dict(max_emit_per_chunk=4 * args.step_read_blocks,
                     blocks_per_step=args.step_read_blocks, t_cap=t_cap)
    beam_kw = dict(beam_size=args.intra_beam, inter_beam=args.inter_beam,
                   gen_beam=args.gen_beam, eager=args.eager,
                   len_scale=args.len_scale, t_cap=t_cap,
                   blocks_per_step=args.step_read_blocks)
    dec = {
        "fused": lambda: FusedIncrementalGreedyDecoder(
            model, params, tgt_dict, model_cfg, **greedy_kw),
        "cached": lambda: CachedFusedGreedyDecoder(
            model, params, tgt_dict, model_cfg, **greedy_kw),
        "oneshot": lambda: OneShotCorpusDecoder(
            model, params, tgt_dict, model_cfg, **greedy_kw),
        "beam": lambda: BatchedBeamStreamingDecoder(
            model, params, tgt_dict, model_cfg, **beam_kw),
        "oneshot-beam": lambda: OneShotBeamDecoder(
            model, params, tgt_dict, model_cfg, **beam_kw),
        # zero host syncs; require inter_beam=1 (see the class docstrings):
        # fused-beam = one-shot encode (corpus eval), stream-beam =
        # incremental encode (serving semantics)
        "fused-beam": lambda: FusedOneShotBeamDecoder(
            model, params, tgt_dict, model_cfg, **beam_kw),
        "stream-beam": lambda: FusedBeamStreamingDecoder(
            model, params, tgt_dict, model_cfg, **beam_kw),
    }[args.decoder]()

    # length-sorted batches: similar lengths share padded shapes
    order = sorted(range(n), key=lambda i: -len(wavs[i]))
    bs = args.batch_size or n
    hyps = [None] * n
    delays = [None] * n
    import time
    t0 = time.time()
    for s in range(0, n, bs):
        rows = order[s:s + bs]
        th, td = dec.decode_corpus([wavs[i] for i in rows])
        for r, h, d in zip(rows, th, td):
            hyps[r], delays[r] = h, d
    dt = time.time() - t0
    audio_sec = sum(len(w) for w in wavs) / 16000.0
    al = [average_lagging(d, len(w) / 16.0, max(len(r.split()), 1))
          for d, w, r in zip(delays, wavs, refs) if d]
    quality = (corpus_bleu(hyps, refs) if args.metric == "bleu"
               else corpus_wer(hyps, refs))
    print(json.dumps({
        args.metric.upper(): quality,
        "AL": float(np.mean(al)) if al else 0.0,
        "audio_sec_per_sec": round(audio_sec / dt, 1),
        "n": n,
        "step_read_blocks": args.step_read_blocks,
    }))


def cmd_sweep(args):
    """Quality@latency operating-point sweep: one batched decode per
    DECISION_STEP, one JSON line each — the reference's eval loop
    (wav2vec_s_scripts/eval/eval_wav2vec_s_caat_st.sh:3 runs a separate
    simuleval per ``DECISION_STEP in {2,4,10,20}``; the paper's BLEU@AL /
    WER@AL curves are exactly this table)."""
    for srb in (int(s) for s in args.steps.split(",")):
        args.step_read_blocks = srb
        cmd_batch_decode(args)


def cmd_generate(args):
    from wav2vec_s_tpu.data import read_s2t_manifest
    from wav2vec_s_tpu.data.audio import read_audio
    from wav2vec_s_tpu.eval.bleu import corpus_bleu
    from wav2vec_s_tpu.eval.generator import transducer_offline_decode
    from wav2vec_s_tpu.eval.wer import corpus_wer
    from wav2vec_s_tpu.stream.engine import StreamingEngine
    from wav2vec_s_tpu.stream.searcher import StreamingTransducerSearcher
    from wav2vec_s_tpu.train.config import load_config

    cfg = load_config(args.config, args.overrides)
    model, tgt_dict, model_cfg, caat_cfg = _build_caat(cfg)
    params = _load_params(args.ckpt_dir, args.average_k)
    engine = StreamingEngine(model, params,
                             main_context=cfg.context.main_context,
                             right_context=cfg.context.right_context)
    searcher = StreamingTransducerSearcher(engine, tgt_dict,
                                           len_scale=args.len_scale)
    man = read_s2t_manifest(args.manifest, cfg.data.audio_root)
    n = min(len(man.ids), args.max_instances or len(man.ids))
    hyps, refs = [], []
    for i in range(n):
        wav = read_audio(man.audio_paths[i])
        hypo = transducer_offline_decode(searcher, wav,
                                         intra_beam=args.intra_beam)
        hyps.append(hypo)
        refs.append(man.tgt_texts[i])
        print(json.dumps({"id": man.ids[i], "hypo": hypo,
                          "ref": refs[-1]}))
    score = (corpus_bleu(hyps, refs) if args.metric == "bleu"
             else corpus_wer(hyps, refs))
    print(json.dumps({args.metric.upper(): score, "n": n}))


def cmd_ctc_decode(args):
    """Batched offline CTC decode + WER over a manifest — the eval side of
    the ``run.task: ctc`` fine-tune (fairseq's viterbi/argmax WER path for
    Wav2VecCtc, wav2vec2_asr.py:154 + criterions/ctc.py; blank = bos)."""
    from wav2vec_s_tpu.data import Dictionary, read_s2t_manifest
    from wav2vec_s_tpu.data.audio import instance_normalize, read_audio
    from wav2vec_s_tpu.data.batching import bucket_for, length_buckets
    from wav2vec_s_tpu.data.tokenizer import build_tokenizer
    from wav2vec_s_tpu.eval.generator import make_ctc_greedy_decoder
    from wav2vec_s_tpu.eval.wer import corpus_wer
    from wav2vec_s_tpu.models import Wav2Vec2Config
    from wav2vec_s_tpu.models.asr import Wav2VecCtc
    from wav2vec_s_tpu.stream.searcher import detok_pieces
    from wav2vec_s_tpu.train.config import load_config

    cfg = load_config(args.config, args.overrides)
    tgt_dict = Dictionary.load(cfg.data.vocab)
    model_cfg = Wav2Vec2Config(
        main_context=cfg.context.main_context,
        right_context=cfg.context.right_context,
        context_type="constant", **cfg.model)
    model = Wav2VecCtc(model_cfg, vocab_size=len(tgt_dict))
    params = _load_params(args.ckpt_dir, args.average_k)
    decode = make_ctc_greedy_decoder(
        model, tgt_dict, cfg.context.main_context,
        cfg.context.right_context, blank=tgt_dict.bos())
    tokenizer = None
    if cfg.data.tokenizer != "word":
        tokenizer = build_tokenizer(cfg.data.tokenizer,
                                    cfg.data.spm_model or None)

    man = read_s2t_manifest(args.manifest, cfg.data.audio_root)
    n = min(len(man.ids), args.max_instances or len(man.ids))
    # length-sorted batches over a geometric pad grid bound recompiles
    order = sorted(range(n), key=lambda i: man.n_frames[i])
    buckets = length_buckets(int(max(man.n_frames[i] for i in order)),
                             multiple=640)
    hyps, refs = [None] * n, [None] * n
    for lo in range(0, n, args.batch_size):
        idx = order[lo:lo + args.batch_size]
        wavs = [read_audio(man.audio_paths[i]) for i in idx]
        if cfg.data.normalize:
            wavs = [instance_normalize(w) for w in wavs]
        S = bucket_for(max(len(w) for w in wavs), buckets)
        src = np.zeros((len(idx), S), np.float32)
        pad = np.ones((len(idx), S), bool)
        for r, w in enumerate(wavs):
            src[r, :len(w)] = w[:S]
            pad[r, :len(w)] = False
        pfx, lens = decode(params, src, pad)
        pfx, lens = np.asarray(pfx), np.asarray(lens)
        for r, i in enumerate(idx):
            hyps[i] = detok_pieces(tgt_dict, tokenizer, pfx[r, 1:lens[r]])
            refs[i] = man.src_texts[i] or man.tgt_texts[i]
            print(json.dumps({"id": man.ids[i], "hypo": hyps[i],
                              "ref": refs[i]}))
    print(json.dumps({"WER": corpus_wer(hyps, refs), "n": n}))


def cmd_interactive(args):
    """Interactive streaming decode (fairseq_cli/interactive.py twin).

    Reads one utterance per line from ``--input`` (default: stdin) — a wav
    path, optionally followed by tab-separated fields that are echoed back —
    and decodes it with the streaming agent, printing words AS THEY ARE
    EMITTED with the ms of audio consumed at emission:

        S-0   /path/utt.wav
        W-0   475.0   hello
        W-0   950.0   world
        H-0   hello world
    """
    from wav2vec_s_tpu.data.audio import read_audio
    from wav2vec_s_tpu.stream.agent import SAMPLES_PER_MS
    from wav2vec_s_tpu.train.config import load_config

    cfg = load_config(args.config, args.overrides)
    factory = _agent_factory(args, cfg)
    seg = args.segment_size * SAMPLES_PER_MS

    src = open(args.input) if args.input != "-" else sys.stdin
    try:
        for uid, line in enumerate(src):
            path = line.strip().split("\t")[0]
            if not path:
                continue
            print(f"S-{uid}\t{path}", flush=True)
            wav = read_audio(path)
            agent = factory()
            words, offset = [], 0
            while offset < len(wav):
                chunk = wav[offset:offset + seg]
                offset = min(offset + seg, len(wav))
                agent.push(chunk, is_end=(offset >= len(wav)))
                while True:
                    w = agent.pop_word()
                    if w is None:
                        break
                    words.append(w)
                    print(f"W-{uid}\t{offset / SAMPLES_PER_MS:.1f}\t{w}",
                          flush=True)
            print(f"H-{uid}\t{' '.join(words)}", flush=True)
    finally:
        if src is not sys.stdin:
            src.close()


def cmd_eval_lm(args):
    """Perplexity of the decoupled CAAT decoder as a language model
    (fairseq_cli/eval_lm.py twin for this framework's only LM surface).

    Scores each line of ``--text`` (tokenized with the configured
    tokenizer, eos-terminated) under ``W2V2CaatModel.lm_log_probs`` and
    reports summed NLL, loss in base 2, and perplexity.
    """
    import math

    import jax.numpy as jnp

    from wav2vec_s_tpu.data.tokenizer import build_tokenizer
    from wav2vec_s_tpu.models.caat import W2V2CaatModel
    from wav2vec_s_tpu.train.config import load_config

    cfg = load_config(args.config, args.overrides)
    model, tgt_dict, model_cfg, caat_cfg = _build_caat(cfg)
    params = _load_params(args.ckpt_dir, args.average_k)
    tokenizer = None
    if cfg.data.tokenizer != "word":
        tokenizer = build_tokenizer(cfg.data.tokenizer,
                                    cfg.data.spm_model or None)

    @jax.jit
    def score(prev, tgt):
        lp = model.apply({"params": params}, prev,
                         method=W2V2CaatModel.lm_log_probs)
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        keep = (tgt != caat_cfg.pad).astype(jnp.float32)
        return jnp.sum(nll * keep), jnp.sum(keep)

    lines = [l for l in open(args.text) if l.strip()]
    total_nll = total_tok = 0.0
    bs = args.batch_size or 32
    for s in range(0, len(lines), bs):
        chunk = lines[s:s + bs]
        toks = [tgt_dict.encode(
            tokenizer.encode(l) if tokenizer else l.split(), append_eos=True)
            for l in chunk]
        # pad U to a small bucket grid to bound executable count
        u_max = -(-max(len(t) for t in toks) // 16) * 16
        tgt = np.full((len(toks), u_max), caat_cfg.pad, np.int32)
        for i, t in enumerate(toks):
            tgt[i, :len(t)] = t
        prev = np.concatenate(
            [np.full((len(toks), 1), caat_cfg.bos, np.int32),
             tgt[:, :-1]], axis=1)
        nll, ntok = score(jnp.asarray(prev), jnp.asarray(tgt))
        total_nll += float(nll)
        total_tok += float(ntok)
    loss = total_nll / max(total_tok, 1.0)
    print(json.dumps({
        "loss": round(loss, 4),
        "loss_base2": round(loss / math.log(2), 4),
        "perplexity": round(math.exp(loss), 4),
        "ntokens": int(total_tok),
        "nsentences": len(lines),
    }))


def cmd_score(args):
    """BLEU/WER of a system file vs a reference file — the fairseq-score
    twin (fairseq/fairseq_cli/score.py): ``--sys -`` reads stdin,
    ``--ignore-case`` lowercases both sides, ``--sentence-bleu`` prints
    per-line smoothed BLEU instead of the corpus score."""
    from wav2vec_s_tpu.eval.bleu import corpus_bleu, sentence_bleu
    from wav2vec_s_tpu.eval.wer import corpus_wer

    def read(path):
        if path == "-":
            lines = [ln.rstrip("\n") for ln in sys.stdin]
        else:
            with open(path) as fh:
                lines = [ln.rstrip("\n") for ln in fh]
        return [ln.lower() for ln in lines] if args.ignore_case else lines

    hyps, refs = read(args.sys), read(args.ref)
    if len(hyps) != len(refs):
        raise SystemExit(
            f"line count mismatch: sys={len(hyps)} ref={len(refs)}")
    if args.sentence_bleu:
        for i, (h, r) in enumerate(zip(hyps, refs)):
            print(json.dumps({"i": i, "BLEU": round(sentence_bleu(h, r), 2)}))
        return
    out = {"n": len(hyps)}
    if args.metric in ("bleu", "both"):
        out["BLEU"] = round(corpus_bleu(hyps, refs), 2)
    if args.metric in ("wer", "both"):
        out["WER"] = round(corpus_wer(hyps, refs), 4)
    print(json.dumps(out))


def main(argv=None):
    p = argparse.ArgumentParser("wav2vec_s_tpu eval")
    sub = p.add_subparsers(dest="cmd", required=True)

    pa = sub.add_parser("average")
    pa.add_argument("--ckpt-dir", required=True)
    pa.add_argument("--k", type=int, default=5)
    pa.add_argument("--out", required=True)

    def common(sp, manifest=True):
        sp.add_argument("--config", required=True)
        sp.add_argument("--ckpt-dir", required=True)
        sp.add_argument("--manifest", required=manifest)
        sp.add_argument("--average-k", type=int, default=0)
        sp.add_argument("--metric", default="bleu", choices=["bleu", "wer"])
        sp.add_argument("--intra-beam", type=int, default=5)
        sp.add_argument("--inter-beam", type=int, default=1)
        sp.add_argument("--gen-beam", type=float, default=2.0)
        sp.add_argument("--step-read-blocks", type=int, default=2)
        sp.add_argument("--decoder-step-read", type=int, default=256)
        sp.add_argument("--segment-size", type=int, default=25)
        sp.add_argument("--eager", action="store_true", default=True)
        sp.add_argument("--len-scale", type=float, default=0.7)
        sp.add_argument("--max-len-a", type=float, default=0.048)
        sp.add_argument("--max-len-b", type=float, default=-5.0)
        sp.add_argument("--max-instances", type=int, default=0)
        sp.add_argument("--platform", default=None)
        sp.add_argument("--decoder", default="cached",
                        choices=["fused", "cached", "oneshot", "beam",
                                 "oneshot-beam", "fused-beam",
                                 "stream-beam"])
        sp.add_argument("--batch-size", type=int, default=128)
        sp.add_argument("overrides", nargs="*", default=[])

    ps = sub.add_parser("simul")
    common(ps)
    pg = sub.add_parser("generate")
    common(pg)
    pb = sub.add_parser("batch-decode")
    common(pb)
    pc = sub.add_parser("ctc-decode")
    common(pc)
    psw = sub.add_parser("sweep")
    common(psw)
    psw.add_argument("--steps", default="2,4,10,20",
                     help="comma list of DECISION_STEP operating points")

    pi = sub.add_parser("interactive")
    common(pi, manifest=False)
    pi.add_argument("--input", default="-",
                    help="file of wav paths, one per line ('-' = stdin)")
    pl = sub.add_parser("eval-lm")
    common(pl, manifest=False)
    pl.add_argument("--text", required=True,
                    help="plain-text file to score, one sentence per line")

    px = sub.add_parser("score")
    px.add_argument("-s", "--sys", default="-", help="system output file "
                    "('-' = stdin)")
    px.add_argument("-r", "--ref", required=True, help="reference file")
    px.add_argument("--metric", default="bleu",
                    choices=["bleu", "wer", "both"])
    px.add_argument("--ignore-case", action="store_true")
    px.add_argument("--sentence-bleu", action="store_true",
                    help="per-line smoothed BLEU instead of corpus BLEU")

    argv_list = list(argv) if argv is not None else None
    args = p.parse_args(argv_list)
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    {"average": cmd_average, "simul": cmd_simul,
     "generate": cmd_generate, "interactive": cmd_interactive,
     "eval-lm": cmd_eval_lm, "ctc-decode": cmd_ctc_decode,
     "batch-decode": cmd_batch_decode, "sweep": cmd_sweep,
     "score": cmd_score}[args.cmd](args)


if __name__ == "__main__":
    main()
