from kvae_tpu.parallel.mesh import batch_sharding, make_mesh, replicate  # noqa: F401
from kvae_tpu.parallel.seqpar import (  # noqa: F401
    lgssm_smooth_seqpar,
    make_time_mesh,
    time_sharding,
)
