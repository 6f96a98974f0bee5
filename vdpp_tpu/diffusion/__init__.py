"""Diffusion math: noise schedules, solvers, and guidance."""

from vdpp_tpu.diffusion.scheduler import (
    EulerKarrasSchedule,
    FlowMatchSchedule,
    default_timestep_schedule,
    dpmpp2m_step_v_prediction,
    euler_ancestral_step_v_prediction,
    euler_step_v_prediction,
    flowmatch_sigmas,
    flowmatch_step,
    heun_step_v_prediction,
    karras_sigmas,
    scale_model_input,
)

__all__ = [
    "EulerKarrasSchedule",
    "FlowMatchSchedule",
    "default_timestep_schedule",
    "dpmpp2m_step_v_prediction",
    "euler_ancestral_step_v_prediction",
    "euler_step_v_prediction",
    "flowmatch_sigmas",
    "flowmatch_step",
    "heun_step_v_prediction",
    "karras_sigmas",
    "scale_model_input",
]
