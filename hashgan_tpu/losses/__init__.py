from hashgan_tpu.losses.wgan_gp import critic_loss_fn, generator_loss_fn, gradient_penalty  # noqa: F401
from hashgan_tpu.losses.pairwise import pairwise_similarity, wml_pairwise_loss  # noqa: F401
