from .losses import (
    get_optimizer,
    lr_schedule,
    get_sde_loss_fn,
    get_smld_loss_fn,
    get_ddpm_loss_fn,
    discretized_gaussian_log_likelihood,
)

__all__ = [
    "get_optimizer",
    "lr_schedule",
    "get_sde_loss_fn",
    "get_smld_loss_fn",
    "get_ddpm_loss_fn",
    "discretized_gaussian_log_likelihood",
]
