from hashgan_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from hashgan_tpu.parallel.sharded_scan import (  # noqa: F401
    shard_grouped_gallery,
    sharded_groupmin_topk,
    sharded_hamming_topk,
)
