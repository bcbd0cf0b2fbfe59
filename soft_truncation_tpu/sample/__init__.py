from .sampling import (
    get_sampling_fn,
    get_pc_sampler,
    get_ode_sampler,
    get_dpm_solver_sampler,
    register_predictor,
    register_corrector,
    get_predictor,
    get_corrector,
)
from .ode import odeint_dopri5, odeint_rk4_fixed
from .parallel import get_picard_dpm_sampler, get_picard_pc_sampler

__all__ = [
    "get_sampling_fn",
    "get_pc_sampler",
    "get_ode_sampler",
    "get_dpm_solver_sampler",
    "get_picard_pc_sampler",
    "get_picard_dpm_sampler",
    "register_predictor",
    "register_corrector",
    "get_predictor",
    "get_corrector",
    "odeint_dopri5",
    "odeint_rk4_fixed",
]
