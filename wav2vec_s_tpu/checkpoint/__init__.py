from wav2vec_s_tpu.checkpoint.torch_import import (
    load_torch_checkpoint,
    import_wav2vec2_params,
)
from wav2vec_s_tpu.checkpoint.torch_export import (
    export_wav2vec2_params,
    export_caat_params,
    save_fairseq_checkpoint,
)
from wav2vec_s_tpu.checkpoint.warm_start import (
    load_params_tree,
    load_pretrained_encoder,
)
