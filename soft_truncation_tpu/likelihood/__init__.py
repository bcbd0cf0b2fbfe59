from .likelihood import (
    get_likelihood_fn,
    get_elbo_fn,
    get_likelihood_residual_fn,
)

__all__ = [
    "get_likelihood_fn",
    "get_elbo_fn",
    "get_likelihood_residual_fn",
]
