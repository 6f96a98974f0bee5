"""Diffusion math: noise schedules and guidance."""

from vdpp_tpu.diffusion.scheduler import (
    EulerKarrasSchedule,
    karras_sigmas,
    scale_model_input,
    euler_step_v_prediction,
    default_timestep_schedule,
)

__all__ = [
    "EulerKarrasSchedule",
    "karras_sigmas",
    "scale_model_input",
    "euler_step_v_prediction",
    "default_timestep_schedule",
]
