from wav2vec_s_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated, shard_batch, MeshAxes)
from wav2vec_s_tpu.parallel.sharding import (
    param_shardings, shard_params)
