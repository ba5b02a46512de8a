"""SimulEval-compatible server/client tests: real tornado server + HTTP
round-trip with a dummy wait-k agent (the reference's test_server/test_cli
pattern)."""

import numpy as np
import pytest

pytest.importorskip("tornado")

from wav2vec_s_tpu.stream.server import (
    Scorer, AudioInstance, start_server_thread, DEFAULT_EOS)
from wav2vec_s_tpu.stream.client import Client, evaluate_corpus

PORT = 12399


class DummyWaitKAgent:
    """Emits one reference-ish word per 200ms of audio after 400ms."""

    def __init__(self, words):
        self.words = list(words)
        self.reset()

    def reset(self):
        self.n = 0
        self.emitted = 0
        self.queue = []
        self.finished = False

    def push(self, samples, is_end):
        self.n += len(samples)
        while (self.n >= 6400 + self.emitted * 3200
               and self.emitted < len(self.words)):
            self.queue.append(self.words[self.emitted])
            self.emitted += 1
        if is_end:
            self.queue.extend(self.words[self.emitted:])
            self.emitted = len(self.words)
            self.finished = True

    def pop_word(self):
        return self.queue.pop(0) if self.queue else None


@pytest.fixture(scope="module")
def server():
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(16000).astype(np.float32) * 0.1,
            rng.standard_normal(8000).astype(np.float32) * 0.1]
    refs = ["hello world again", "short one"]
    scorer = Scorer(wavs, refs, quality_metric="bleu")
    start_server_thread(scorer, PORT)
    return scorer, refs


def test_http_round_trip(server):
    scorer, refs = server
    client = Client(port=PORT)
    info = client.corpus_info()
    assert info["num_sentences"] == 2

    scores = evaluate_corpus(
        client, lambda: DummyWaitKAgent(refs[0].split()), segment_size=25)
    # instance 1 got instance-0's words -> BLEU < 100, but the pipeline ran
    assert "BLEU" in scores and "AL" in scores and "AL_CA" in scores
    assert np.isfinite(scores["AL"])

    summary = client.get_scores(instance_id=0)
    assert summary["prediction"] == refs[0]
    # delays recorded per word, monotone, within source length
    d = summary["delays"]
    assert len(d) == len(refs[0].split()) + 1  # + </s>
    assert all(x <= summary["source_length"] for x in d)
    assert d == sorted(d)


def test_audio_instance_segments():
    wav = np.ones(1600, np.float32) * 0.5
    ins = AudioInstance(0, wav, "a b")
    seg = ins.send_src(25)  # 25ms = 400 samples
    assert len(seg["segment"]) == 400 and not seg["finished"]
    for _ in range(3):
        seg = ins.send_src(25)
    assert seg["finished"]
    seg = ins.send_src(25)
    assert seg["segment"] == DEFAULT_EOS


def test_wer_mode():
    wavs = [np.zeros(3200, np.float32)]
    scorer = Scorer(wavs, ["a b c"], quality_metric="wer")
    scorer.recv_hyp(0, ["a", "x", "c", DEFAULT_EOS])
    s = scorer.score()
    assert abs(s["WER"] - 100.0 / 3) < 1e-6


def test_client_pool_two_workers(server):
    """N-client orchestration (simuleval/cli.py:126-150 twin): two worker
    clients shard the corpus, the server merges scores; per-instance
    predictions land on the right instance ids."""
    from wav2vec_s_tpu.stream.client import evaluate_corpus_pool

    scorer, refs = server

    def agent_factory():
        # each utterance gets an agent seeded with ITS words via a shared
        # rotation (workers race on pop, so hand out by instance id
        # instead): emit per-instance references so BLEU is exact
        return _PerInstanceAgent(refs)

    scores = evaluate_corpus_pool(
        lambda: Client(port=PORT), agent_factory, n_clients=2,
        segment_size=25)
    assert "BLEU" in scores and np.isfinite(scores["AL"])
    # exact per-instance predictions prove ids were sharded correctly
    # across the two workers (corpus BLEU itself is 0 here: the fixture
    # refs have no 4-grams, the sacrebleu-consistent convention)
    for i, ref in enumerate(refs):
        assert Client(port=PORT).get_scores(instance_id=i)[
            "prediction"] == ref


class _PerInstanceAgent(DummyWaitKAgent):
    """Learns its instance's reference from the first audio length."""

    def __init__(self, refs):
        self._refs = refs
        super().__init__([])

    def push(self, samples, is_end):
        if not self.words:
            # instance identity via audio length (16000 vs 8000 samples)
            self._total = getattr(self, "_total", 0) + len(samples)
        self.n += len(samples)
        if is_end and not self.words:
            self.words = list(self._refs[0].split()
                              if self._total > 12000
                              else self._refs[1].split())
            self.queue.extend(self.words)
            self.emitted = len(self.words)
            self.finished = True
