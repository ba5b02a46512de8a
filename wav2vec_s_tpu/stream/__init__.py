from wav2vec_s_tpu.stream.latency import (
    average_proportion, average_lagging, differentiable_average_lagging)
from wav2vec_s_tpu.stream.searcher import StreamingTransducerSearcher
from wav2vec_s_tpu.stream.agent import SpeechTransducerAgent, SimulEvaluator
