"""Exact forward parity for the legacy DDPM U-Net: Flax DDPM with
reference-ported weights must reproduce the reference torch forward
(goldens from tools/make_ddpm_goldens.py, reference models/ddpm.py:40-181).
Covers both the vp-style (centered) and smld-style (scale_by_sigma) paths.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.utils.torch_port import port_ddpm_state_dict

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "vp": dict(scale_by_sigma=False, centered=True),
    "smld": dict(scale_by_sigma=True, centered=False),
}


def make_config(case):
  config = default_config("cifar10")
  override(config, {
      "model": dict(
          name="ddpm", nf=32, ch_mult=(1, 2), num_res_blocks=1,
          attn_resolutions=(8,), dropout=0.1, resamp_with_conv=True,
          conditional=True, nonlinearity="swish",
          scale_by_sigma=case["scale_by_sigma"], num_scales=10,
          sigma_min=0.01, sigma_max=50.0, ema_rate=0.999,
          normalization="GroupNorm"),
      "data": dict(image_size=16, centered=case["centered"]),
  })
  return config


@pytest.mark.parametrize("name", list(CASES))
def test_ddpm_forward_parity(name):
  gold = np.load(os.path.join(GOLD_DIR, f"ddpm_golden_{name}.npz"))
  config = make_config(CASES[name])
  model = create_model(config)

  x = jnp.asarray(np.transpose(gold["x"], (0, 2, 3, 1)))
  labels = jnp.asarray(gold["labels"]).astype(jnp.float32)

  variables = model.init({"params": jax.random.PRNGKey(0)}, x, labels,
                         train=False)
  sd = {k[4:]: gold[k] for k in gold.files if k.startswith("sd::")}
  ported = port_ddpm_state_dict(sd, config)

  init_paths = {jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
  ported_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(ported)[0]}
  assert init_paths == ported_paths, (
      f"missing={sorted(init_paths - ported_paths)[:8]} "
      f"extra={sorted(ported_paths - init_paths)[:8]}")

  params = jax.tree.map(jnp.asarray, ported)
  out = model.apply({"params": params}, x, labels, train=False)
  want = np.transpose(gold["y"], (0, 2, 3, 1))
  np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=2e-4)
