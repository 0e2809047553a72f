from .ddim import DDIMSchedule, make_ddim_schedule, ddim_step, add_noise, get_velocity
