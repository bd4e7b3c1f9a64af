from .schedule import (
    Schedule,
    named_beta_schedule,
    space_timesteps,
    spaced_schedule,
)
from .sampler import (
    DiffusionSampler,
    SamplerConfig,
)

__all__ = [
    "Schedule",
    "named_beta_schedule",
    "space_timesteps",
    "spaced_schedule",
    "DiffusionSampler",
    "SamplerConfig",
]
