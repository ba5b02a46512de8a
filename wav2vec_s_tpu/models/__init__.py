from wav2vec_s_tpu.models.modules import (
    MultiheadSelfAttention,
    TransformerEncoderLayer,
    grad_multiply,
)
from wav2vec_s_tpu.models.feature_extractor import ConvFeatureExtractor
from wav2vec_s_tpu.models.quantizer import GumbelVectorQuantizer
from wav2vec_s_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    wav2vec2_base_config,
    wav2vec_s_base_config,
    wav2vec_s_large_config,
)
