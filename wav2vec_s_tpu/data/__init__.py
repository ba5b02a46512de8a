from wav2vec_s_tpu.data.audio import read_audio, write_wav
from wav2vec_s_tpu.data.dictionary import Dictionary
from wav2vec_s_tpu.data.manifests import (
    AudioManifest, read_audio_manifest, S2TManifest, read_s2t_manifest,
    read_text_manifest)
from wav2vec_s_tpu.data.batching import (
    length_buckets, batch_by_size, EpochBatchIterator)
from wav2vec_s_tpu.data.dataset import (
    PretrainBatcher, CaatBatcher, TextBatcher)
