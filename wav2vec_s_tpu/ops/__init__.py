from wav2vec_s_tpu.ops.block_mask import (
    BlockLayout,
    block_layout,
    append_right_context,
    extend_padding_mask,
    block_attn_bias,
    strip_right_context,
)
