from .profiling import step_timer, trace, unet_flops
