from hashgan_tpu.models.layers import CondBatchNorm, local_response_norm  # noqa: F401
from hashgan_tpu.models.gan import Discriminator, Generator  # noqa: F401
from hashgan_tpu.models.encoders import SmallCNNEncoder, ResNetEncoder, build_encoder  # noqa: F401
from hashgan_tpu.models.alexnet import AlexNetEncoder  # noqa: F401
