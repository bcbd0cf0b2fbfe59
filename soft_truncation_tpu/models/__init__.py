from .registry import register_model, get_model, create_model
from .score import get_model_fn, get_score_fn
from .ema import ema_update
from .params import get_sigmas, get_ddpm_params

# import for registration side effects
from . import ncsnpp  # noqa: F401
from . import ddpm  # noqa: F401
from . import ncsnv2  # noqa: F401
from . import logsnr  # noqa: F401

__all__ = [
    "register_model",
    "get_model",
    "create_model",
    "get_model_fn",
    "get_score_fn",
    "ema_update",
]
