"""Import hygiene: importing the package must not initialize a JAX
backend.

A module-level device op (e.g. a jnp.array constant) eagerly initializes
the platform stack at import time, which (a) silently defeats any
jax.config platform pin applied after the import — the documented
pin-then-import contract of tools/export_sampler.py and
serve/server.py --cpu — and (b) wedges the import outright when the TPU
tunnel is unhealthy (CLAUDE.md). Regression: sample/ode.py's
Dormand-Prince tableau used to be module-level jnp arrays.
"""

import subprocess
import sys

import pytest

_IMPORTS = ", ".join([
    "soft_truncation_tpu.run_lib",
    "soft_truncation_tpu.sample",
    "soft_truncation_tpu.likelihood",
    "soft_truncation_tpu.serve.server",
    "soft_truncation_tpu.eval.evaluation",
    "soft_truncation_tpu.data",
])

_PROBE = f"""
import {_IMPORTS}
from jax._src import xla_bridge
assert not xla_bridge._backends, (
    "package import initialized JAX backends: %r" % (xla_bridge._backends,))
print("no-backend-ok")
"""


@pytest.mark.fast
def test_package_import_initializes_no_backend():
  # fresh interpreter: the conftest's platform pin must not mask an
  # import-time device op, and the wedgeable axon backend must never be
  # touched — the assertion inspects the backend cache without querying
  out = subprocess.run([sys.executable, "-c", _PROBE], text=True,
                       capture_output=True, timeout=180)
  assert out.returncode == 0, out.stderr[-2000:]
  assert "no-backend-ok" in out.stdout
