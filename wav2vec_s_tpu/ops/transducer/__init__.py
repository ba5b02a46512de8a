from wav2vec_s_tpu.ops.transducer.jnp_impl import (
    rnnt_loss,
    delay_transducer_loss,
    delay_cost_zero,
    delay_cost_diagonal,
    delay_cost_diag_positive,
)
