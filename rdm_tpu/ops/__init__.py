from rdm_tpu.ops.schedules import (
    DDIMSchedule,
    DiffusionSchedule,
    ddim_step,
    make_beta_schedule,
    make_ddim_timesteps,
    predict_start_from_noise,
    q_sample,
    timestep_embedding,
)

__all__ = [
    "DDIMSchedule",
    "DiffusionSchedule",
    "ddim_step",
    "make_beta_schedule",
    "make_ddim_timesteps",
    "predict_start_from_noise",
    "q_sample",
    "timestep_embedding",
]
