from .core import (
    SDE,
    VPSDE,
    SubVPSDE,
    VESDE,
    ReciprocalVESDE,
    ReverseSDE,
    get_sde,
    st_active_for,
    batch_mul,
)

__all__ = [
    "SDE",
    "VPSDE",
    "SubVPSDE",
    "VESDE",
    "ReciprocalVESDE",
    "ReverseSDE",
    "get_sde",
    "st_active_for",
    "batch_mul",
]
