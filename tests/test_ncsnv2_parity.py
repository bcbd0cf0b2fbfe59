"""Exact forward parity for the NCSNv2 family: Flax NCSNv2 with
reference-ported weights must reproduce the reference torch forward
(goldens from tools/make_ncsnv2_goldens.py; the reference models run
only with its construction bugs shimmed to the intended semantics —
see PARITY.md known-bug list #10-12).

Covers RefineNet CRP/RCU/MSF blocks, dilated residual blocks,
InstanceNorm++, corner-aligned bilinear MSF fusion, and sigma scaling
across all three unconditional v2 variants.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.utils.torch_port import port_ncsnv2_state_dict

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = ["ncsnv2_64", "ncsnv2_128", "ncsnv2_256"]


def make_config(name, image_size):
  config = default_config("cifar10")
  override(config, {
      "model": dict(
          name=name, nf=16, num_scales=10, sigma_min=0.01, sigma_max=50.0,
          normalization="InstanceNorm++", nonlinearity="elu",
          ema_rate=0.999),
      "data": dict(image_size=image_size, centered=False, num_channels=3),
  })
  return config


@pytest.mark.parametrize("name", CASES)
def test_ncsnv2_forward_parity(name):
  gold = np.load(os.path.join(GOLD_DIR, f"ncsnv2_golden_{name}.npz"))
  config = make_config(name, int(gold["image_size"]))
  model = create_model(config)

  x = jnp.asarray(np.transpose(gold["x"], (0, 2, 3, 1)))
  y = jnp.asarray(gold["y_labels"])

  variables = model.init({"params": jax.random.PRNGKey(0)}, x, y,
                         train=False)
  sd = {k[4:]: gold[k] for k in gold.files if k.startswith("sd::")}
  ported = port_ncsnv2_state_dict(sd, config)

  init_paths = {jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
  ported_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(ported)[0]}
  assert init_paths == ported_paths, (
      f"missing={sorted(init_paths - ported_paths)[:8]} "
      f"extra={sorted(ported_paths - init_paths)[:8]}")
  by_path = dict(jax.tree_util.tree_flatten_with_path(ported)[0])
  for p, v in jax.tree_util.tree_flatten_with_path(variables["params"])[0]:
    assert by_path[p].shape == v.shape, (
        f"{jax.tree_util.keystr(p)}: ported {by_path[p].shape} "
        f"vs init {v.shape}")

  params = jax.tree.map(jnp.asarray, ported)
  out = model.apply({"params": params}, x, y, train=False)
  want = np.transpose(gold["y"], (0, 2, 3, 1))
  np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=2e-4)


def test_ncsn_conditional_forward_parity():
  """NCSNv1 ('ncsn') vs the intent-shimmed reference (the released model
  is unconstructible — PARITY.md bugs #10-12; golden from
  tools/make_ncsn_goldens.py with conditional InstanceNorm++)."""
  gold = np.load(os.path.join(GOLD_DIR, "ncsn_golden.npz"))
  config = make_config("ncsn", 16)
  model = create_model(config)

  x = jnp.asarray(np.transpose(gold["x"], (0, 2, 3, 1)))
  y = jnp.asarray(gold["y_labels"])

  variables = model.init({"params": jax.random.PRNGKey(0)}, x, y,
                         train=False)
  sd = {k[4:]: gold[k] for k in gold.files if k.startswith("sd::")}
  ported = port_ncsnv2_state_dict(sd, config)

  init_paths = {jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
  ported_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(ported)[0]}
  assert init_paths == ported_paths, (
      f"missing={sorted(init_paths - ported_paths)[:8]} "
      f"extra={sorted(ported_paths - init_paths)[:8]}")

  params = jax.tree.map(jnp.asarray, ported)
  out = model.apply({"params": params}, x, y, train=False)
  want = np.transpose(gold["y"], (0, 2, 3, 1))
  np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=2e-4)
