from animate_anything_tpu.diffusion.schedule import (
    DiffusionSchedule,
    make_schedule,
    rescale_zero_terminal_snr,
    add_noise,
    get_velocity,
    ddpm_forward_timesteps,
    ddpm_forward_mask,
)
from animate_anything_tpu.diffusion.samplers import (
    SamplerState,
    ddim_timesteps,
    ddim_step,
    dpmpp_init,
    dpmpp_step,
    sample_loop,
)
from animate_anything_tpu.diffusion.euler_edm import (
    EulerSchedule,
    make_euler_schedule,
    euler_step,
    edm_precondition,
    edm_sample_sigmas,
)

__all__ = [
    "DiffusionSchedule",
    "make_schedule",
    "rescale_zero_terminal_snr",
    "add_noise",
    "get_velocity",
    "ddpm_forward_timesteps",
    "ddpm_forward_mask",
    "SamplerState",
    "ddim_timesteps",
    "ddim_step",
    "dpmpp_init",
    "dpmpp_step",
    "sample_loop",
    "EulerSchedule",
    "make_euler_schedule",
    "euler_step",
    "edm_precondition",
    "edm_sample_sigmas",
]
