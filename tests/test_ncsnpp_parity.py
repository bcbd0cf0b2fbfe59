"""Exact forward parity: Flax NCSN++ with reference-ported weights must
reproduce the reference torch forward to float32 tolerance.

Covers the UNCSN++ path (fir + residual input pyramid + scale_by_sigma),
the deep NCSN++ path (output_skip + input_skip + cat + fixed Fourier
features), and the DDPM++ path (ddpm resblocks + positional embedding).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.utils.torch_port import port_ncsnpp_state_dict

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "uncsnpp": dict(fir=True, progressive_input="residual",
                    scale_by_sigma=True),
    "progressive": dict(progressive="output_skip",
                        progressive_input="input_skip",
                        progressive_combine="cat", fourier_feature=True,
                        fir=True),
    "ddpmpp": dict(resblock_type="ddpm", embedding_type="positional"),
}


def tiny_config(**model_overrides):
  config = default_config("cifar10")
  model = dict(
      name="ncsnpp", scale_by_sigma=False, ema_rate=0.999,
      normalization="GroupNorm", nonlinearity="swish", nf=16,
      ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
      resamp_with_conv=True, conditional=True, fir=False,
      fir_kernel=[1, 3, 3, 1], skip_rescale=True, resblock_type="biggan",
      progressive="none", progressive_input="none",
      progressive_combine="sum", init_scale=0.0,
      embedding_type="fourier", fourier_scale=16, conv_size=3)
  model.update(model_overrides)
  override(config, {"model": model,
                    "data": dict(image_size=16, centered=True)})
  return config


@pytest.mark.parametrize("name", list(CASES))
def test_forward_parity(name):
  gold = np.load(os.path.join(GOLD_DIR, f"ncsnpp_golden_{name}.npz"))
  config = tiny_config(**CASES[name])
  model = create_model(config)

  x = jnp.asarray(np.transpose(gold["x"], (0, 2, 3, 1)))
  t = jnp.asarray(gold["t"])

  # init to get the param structure, then overwrite with ported weights
  variables = model.init({"params": jax.random.PRNGKey(0)}, x, t, train=False)
  sd = {k[4:]: gold[k] for k in gold.files if k.startswith("sd::")}
  ported = port_ncsnpp_state_dict(sd, config)

  # structure check: every initialized param must be covered by the port
  init_flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
  ported_flat = jax.tree_util.tree_flatten_with_path(ported)[0]
  init_paths = {jax.tree_util.keystr(p) for p, _ in init_flat}
  ported_paths = {jax.tree_util.keystr(p) for p, _ in ported_flat}
  assert init_paths == ported_paths, (
      f"missing={sorted(init_paths - ported_paths)[:8]} "
      f"extra={sorted(ported_paths - init_paths)[:8]}")
  ported_by_path = dict(ported_flat)
  for p, v in init_flat:
    assert ported_by_path[p].shape == v.shape, (
        f"{jax.tree_util.keystr(p)}: ported {ported_by_path[p].shape} "
        f"vs init {v.shape}")

  ported = jax.tree.map(jnp.asarray, ported)
  out = model.apply({"params": ported}, x, t, train=False)
  want = np.transpose(gold["y"], (0, 2, 3, 1))
  np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=2e-4)
