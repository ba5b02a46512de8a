from wav2vec_s_tpu.models.caat.config import CaatConfig, caat_base_config
from wav2vec_s_tpu.models.caat.decoder import IsolatedDecoder
from wav2vec_s_tpu.models.caat.jointer import (
    ExpandMultiheadAttention, MHAJointNet, group_attn_bias, num_groups)
from wav2vec_s_tpu.models.caat.transducer_model import (
    W2V2CaatModel, caat_loss)
