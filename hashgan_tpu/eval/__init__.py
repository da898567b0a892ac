from hashgan_tpu.eval.oracle import (  # noqa: F401
    average_precision_np,
    mean_average_precision_np,
    precision_at_radius_np,
    precision_recall_curve_np,
)
from hashgan_tpu.eval.map import (  # noqa: F401
    device_map_at_r,
    device_precision_at_radius,
)
