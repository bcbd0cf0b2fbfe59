"""Production serving: AOT-exported sampler artifacts + HTTP service.

See :mod:`.export` (artifact format, cross-platform lowering, params
packaging) and :mod:`.server` (stdlib HTTP sampling service).
"""

from .export import (artifact_meta, export_sampler, load_artifact,
                     load_params_npz, make_serving_fn, save_artifact,
                     save_params_npz)
from .server import SamplingService, make_server

__all__ = [
    "artifact_meta", "export_sampler", "load_artifact", "load_params_npz",
    "make_serving_fn", "save_artifact", "save_params_npz",
    "SamplingService", "make_server",
]
