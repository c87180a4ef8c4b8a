from .sampler import (
    ddim_invert_loop,
    ddim_sample_loop,
    dpmpp_sample_loop,
    heun_sample_loop,
    inpaint_sample_loop,
    make_cfg_apply_fn,
    make_v_to_eps_apply_fn,
    make_x0_to_eps_apply_fn,
    p_sample_loop,
    respaced_schedule,
    space_timesteps,
)
