"""Test harness config: force an 8-device virtual CPU mesh.

The container's sitecustomize imports jax at interpreter startup and points
it at a tunneled TPU backend ("axon"), so env vars are too late here —
we must override through jax.config before any backend initializes.
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)

# Curated "fast" subset (~4.5 min on this machine vs ~27 min full suite):
# one surface each for SDE math, ops goldens, configs, loss/optimizer/EMA
# parity, model forward parity, the jitted train step, sampler update-fn
# parity, and the eval-stats/cleanfid metric paths. Whole files listed by
# basename; individual tests by exact node-id suffix.
_FAST_FILES = {
    "test_sde.py", "test_ops.py", "test_configs.py", "test_loss_parity.py",
    "test_ema_parity.py", "test_optimizer_parity.py",
    "test_eval_stats_formats.py", "test_cleanfid_api.py",
    "test_tfhub_extractor.py", "test_dispatch_window.py",
    "test_utils_misc.py", "test_tpu_probe.py", "test_sde_properties.py",
    "test_resample_properties.py", "test_cli_shim.py",
    "test_normalization_parity.py",
}
_FAST_NODES = {
    "test_ncsnpp_parity.py::test_forward_parity[ddpmpp]",
    "test_train_step.py::test_training_reduces_loss",
    "test_update_fn_parity.py::test_update_fn_parity[ve_langevin]",
}


def pytest_collection_modifyitems(config, items):
  for item in items:
    fname = item.fspath.basename
    nodeid = f"{fname}::{item.name}"
    if fname in _FAST_FILES or nodeid in _FAST_NODES:
      item.add_marker(pytest.mark.fast)
