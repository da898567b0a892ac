from hashgan_tpu.train.state import (  # noqa: F401
    EncoderState,
    GanState,
    create_encoder_state,
    create_gan_state,
    make_encoder_tx,
    make_gan_tx,
)
from hashgan_tpu.train.hash_step import make_encoder_train_step, make_encode_fn  # noqa: F401
from hashgan_tpu.train.gan_step import make_gan_cycle, make_sample_fn  # noqa: F401
