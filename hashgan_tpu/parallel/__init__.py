from hashgan_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from hashgan_tpu.parallel.sharded_scan import sharded_hamming_topk  # noqa: F401
