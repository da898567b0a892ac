from hashgan_tpu.utils.logging import MetricsLogger  # noqa: F401
from hashgan_tpu.utils.images import save_image_grid  # noqa: F401
from hashgan_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
