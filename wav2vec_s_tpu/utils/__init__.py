from wav2vec_s_tpu.utils.positional import (
    sinusoidal_table,
    sinusoidal_positions_from_padding,
)
from wav2vec_s_tpu.utils.masking import (
    compute_span_mask_np,
    sample_span_mask,
)
