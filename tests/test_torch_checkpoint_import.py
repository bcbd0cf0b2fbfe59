"""Migration path: import a reference-format torch checkpoint
({optimizer, model, ema, step}, reference utils.py:29-36) into Flax."""

import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from soft_truncation_tpu.utils.torch_port import (load_reference_checkpoint,
                                                  port_ddpm_state_dict,
                                                  port_ncsnpp_state_dict)
from tests.test_ncsnpp_parity import CASES, tiny_config

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")


def test_load_reference_checkpoint_with_ema():
  gold = np.load(os.path.join(GOLD_DIR, "ncsnpp_golden_uncsnpp.npz"))
  config = tiny_config(**CASES["uncsnpp"])
  sd = {k[4:]: torch.from_numpy(gold[k]) for k in gold.files
        if k.startswith("sd::")}

  # build shadow params: model params (minus buffers/frozen W) + 1.0
  shadow = []
  for k, v in sd.items():
    if k.endswith("sigmas"):
      continue
    if k.endswith("all_modules.0.W"):
      continue  # frozen GaussianFourier W
    shadow.append(v + 1.0)

  ckpt = {
      "model": sd,
      "ema": {"decay": 0.999, "num_updates": 7, "shadow_params": shadow},
      "optimizer": {},
      "step": 1234,
  }
  with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "checkpoint.pth")
    torch.save(ckpt, path)
    params, ema_params, step = load_reference_checkpoint(path, config)

  assert step == 1234
  # params match the direct port
  direct = port_ncsnpp_state_dict(
      {k: v.numpy() for k, v in sd.items()}, config)
  pk = params["mid_res0"]["conv0"]["kernel"]
  np.testing.assert_array_equal(pk, direct["mid_res0"]["conv0"]["kernel"])
  # ema values are shifted by exactly +1 for every non-frozen param
  ek = ema_params["mid_res0"]["conv0"]["kernel"]
  np.testing.assert_allclose(ek, pk + 1.0, rtol=1e-6)
  # frozen Fourier W keeps its model value in EMA
  np.testing.assert_array_equal(ema_params["fourier_emb"]["W"],
                                params["fourier_emb"]["W"])


def test_load_reference_checkpoint_ddpm_family():
  """The importer dispatches the porter on config.model.name (legacy
  DDPM checkpoints have no Fourier W and use the ddpm module order)."""
  from tests.test_ddpm_parity import CASES as DDPM_CASES
  from tests.test_ddpm_parity import make_config

  gold = np.load(os.path.join(GOLD_DIR, "ddpm_golden_vp.npz"))
  config = make_config(DDPM_CASES["vp"])
  sd = {k[4:]: torch.from_numpy(gold[k]) for k in gold.files
        if k.startswith("sd::")}
  shadow = [v + 1.0 for k, v in sd.items() if not k.endswith("sigmas")]
  ckpt = {"model": sd,
          "ema": {"decay": 0.999, "num_updates": 3, "shadow_params": shadow},
          "optimizer": {}, "step": 77}
  with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "checkpoint.pth")
    torch.save(ckpt, path)
    params, ema_params, step = load_reference_checkpoint(path, config)

  assert step == 77
  direct = port_ddpm_state_dict({k: v.numpy() for k, v in sd.items()},
                                config)
  pk = params["mid_res0"]["conv0"]["kernel"]
  np.testing.assert_array_equal(pk, direct["mid_res0"]["conv0"]["kernel"])
  np.testing.assert_allclose(ema_params["mid_res0"]["conv0"]["kernel"],
                             pk + 1.0, rtol=1e-6)
