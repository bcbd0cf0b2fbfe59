from .metrics import (
    frechet_distance,
    kernel_distance,
    inception_score_from_probs,
    compute_stats,
)
from .evaluation import compute_bpd, compute_fid_and_is, load_dataset_stats

__all__ = [
    "frechet_distance",
    "kernel_distance",
    "inception_score_from_probs",
    "compute_stats",
    "compute_bpd",
    "compute_fid_and_is",
    "load_dataset_stats",
]
