from socialways_tpu.models.generator import (
    encode_observation,
    generator_rollout,
    init_generator,
    social_context,
)
from socialways_tpu.models.discriminator import (
    discriminator_apply,
    init_discriminator,
    restore_linear_only,
)

__all__ = [
    "encode_observation",
    "generator_rollout",
    "init_generator",
    "social_context",
    "discriminator_apply",
    "init_discriminator",
    "restore_linear_only",
]
