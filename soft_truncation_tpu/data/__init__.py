from .datasets import (
    get_dataset,
    get_batch,
    get_data_scaler,
    get_data_inverse_scaler,
    make_preprocess_fn,
    transport_uint8,
)

__all__ = [
    "get_dataset",
    "get_batch",
    "get_data_scaler",
    "get_data_inverse_scaler",
    "make_preprocess_fn",
    "transport_uint8",
]
