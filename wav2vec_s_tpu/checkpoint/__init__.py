from wav2vec_s_tpu.checkpoint.torch_import import (
    load_torch_checkpoint,
    import_wav2vec2_params,
)
