from edtr_tpu.diffusion.schedule import (  # noqa: F401
    Diffusion,
    make_beta_schedule,
    space_timesteps,
)
from edtr_tpu.diffusion.sampler import SpacedSampler  # noqa: F401
