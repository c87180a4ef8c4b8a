from .schedules import (
    NoiseSchedule,
    get_betas,
    linear_betas,
    cosine_alpha_bar,
    betas_for_alpha_bar,
    mixed_alpha_bar,
)
from .edm import (
    EDMConfig,
    karras_sigma_grid,
    loss_weight as edm_loss_weight,
    precond as edm_precond,
)
from .flow import (
    FlowConfig,
    flow_time_grid,
    sample_t as flow_sample_t,
    interpolate as flow_interpolate,
    vp_t_to_flow_t,
)
from .diffusion import (
    DiffusionTables,
    q_mean_std,
    q_sample,
    q_posterior,
    xstart_from_epsilon,
    model_mean_from_epsilon,
    p_step,
    mean_flat,
    normal_kl,
    approx_standard_normal_cdf,
    discretized_gaussian_log_likelihood,
    timestep_embedding,
)
