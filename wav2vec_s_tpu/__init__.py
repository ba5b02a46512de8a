"""wav2vec_s_tpu — a TPU-native streaming speech framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
biaofuxmu/wav2vec-S (streaming-adapted wav2vec 2.0 pre-training, CAAT
simultaneous ASR/ST fine-tuning with an RNN-T-with-delay transducer loss,
incremental block-wise inference, and SimulEval-compatible streaming
evaluation).

Subpackages
-----------
- ``ops``        : compute ops — block-attention masks, attention, and the
                   transducer/delay losses (Pallas TPU kernels + jnp reference).
- ``models``     : flax model definitions (wav2vec 2.0 / wav2vec-S encoders,
                   Gumbel-VQ, CAAT decoder/jointer).
- ``parallel``   : mesh construction, sharding rules, collectives helpers.
- ``train``      : criterions, optimizers/schedules, the jit train step and
                   training loop, config system and CLI.
- ``data``       : manifests, audio IO, length-bucketed batching, tokenizers.
- ``checkpoint`` : orbax save/restore, torch checkpoint import, averaging.
- ``stream``     : incremental (functional) encoder state, transducer beam
                   search, streaming agents, latency metrics.
- ``eval``       : WER/BLEU scoring and offline generation.
"""

__version__ = "0.1.0"
