from .fir import fir_upsample2_pallas, fir_downsample2_pallas, pallas_available

__all__ = [
    "fir_upsample2_pallas",
    "fir_downsample2_pallas",
    "pallas_available",
]
