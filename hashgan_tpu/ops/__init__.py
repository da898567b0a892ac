from hashgan_tpu.ops.ref_numpy import (  # noqa: F401
    hamming_distance_np,
    pack_codes_np,
    unpack_codes_np,
)
from hashgan_tpu.ops.pack import pack_codes, unpack_codes  # noqa: F401
from hashgan_tpu.ops.hamming import (  # noqa: F401
    hamming_distance,
    hamming_scan_topk,
)
from hashgan_tpu.ops.mxu_scan import (  # noqa: F401
    mxu_groupmin_scan,
    mxu_topk,
    to_group_major,
    unpack_to_pm1,
)
