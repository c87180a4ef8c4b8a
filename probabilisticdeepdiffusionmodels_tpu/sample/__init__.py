from .sampler import (
    ddim_sample_loop,
    dpmpp_sample_loop,
    p_sample_loop,
    respaced_schedule,
    space_timesteps,
)
