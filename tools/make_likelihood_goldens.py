"""Golden fixtures for the probability-flow likelihood: runs the REFERENCE
torch likelihood_fn (scipy RK45, CPU) on the tiny ddpmpp golden model.

The ODE latent z is deterministic given the model and data (independent of
the Hutchinson noise), so it is an exact cross-framework check; bpd values
carry Hutchinson variance and are compared statistically.

Usage: python tools/make_likelihood_goldens.py
"""

import sys

sys.path.insert(0, "/root/reference")

import ml_collections
import numpy as np
import torch
import torch.utils.cpp_extension

torch.utils.cpp_extension.load = lambda *a, **k: None

import torch.nn.functional as _F

_orig_interpolate = _F.interpolate


def _fixed_interpolate(input, size=None, scale_factor=None, mode="nearest",
                       **kw):
  if isinstance(scale_factor, str):
    mode, scale_factor = scale_factor, None
  return _orig_interpolate(input, size=size, scale_factor=scale_factor,
                           mode=mode, **kw)


_F.interpolate = _fixed_interpolate

import likelihood as ref_likelihood  # noqa: E402
import sde_lib as ref_sde_lib  # noqa: E402
from models import ncsnpp as ref_ncsnpp  # noqa: E402

sys.path.insert(0, ".")
from tools.make_ncsnpp_goldens import CASES, base_config  # noqa: E402


def main():
  config = base_config()
  for k, v in CASES["ddpmpp"].items():
    setattr(config.model, k, v)
  config.training.sde = "vpsde"
  config.training.unbounded_parametrization = False
  config.training.stabilizing_constant = 1e-3
  config.training.ddpm_score = True
  config.training.importance_sampling = True
  config.training.continuous = True
  config.data.centered = True
  config.data.dequantization = "none"
  config.eval = ml_collections.ConfigDict()
  config.eval.probability_flow = True
  config.eval.lambda_ = 0.0
  config.device = torch.device("cpu")

  torch.manual_seed(0)
  model = ref_ncsnpp.NCSNpp(config, sde=None)
  model.eval()

  gold = np.load("tests/golden/ncsnpp_golden_ddpmpp.npz")
  sd = {k[4:]: torch.from_numpy(gold[k]) for k in gold.files
        if k.startswith("sd::")}
  model.load_state_dict(sd)

  sde = ref_sde_lib.VPSDE(truncation_time=1e-5, beta_min=0.1, beta_max=20,
                          N=1000)
  inverse_scaler = lambda x: (x + 1.0) / 2.0

  torch.manual_seed(1)
  data = torch.rand(4, 3, 16, 16) * 2 - 1

  likelihood_fn = ref_likelihood.get_likelihood_fn(
      config, sde, inverse_scaler, hutchinson_type="Rademacher",
      rtol=1e-4, atol=1e-4)
  torch.manual_seed(2)
  bpd_w, z_w, nfe_w = likelihood_fn(model, data, mode="wrong", eps=1e-5)
  torch.manual_seed(3)
  bpd_c, z_c, nfe_c = likelihood_fn(model, data, mode="correct", eps=1e-5)

  elbo_fn = ref_likelihood.get_elbo_fn(config, sde,
                                       inverse_scaler=inverse_scaler)
  nelbos = []
  for i in range(16):
    torch.manual_seed(100 + i)
    nelbo, residual = elbo_fn(model, data, eps=1e-5)
    nelbos.append((nelbo + residual).detach().numpy())

  np.savez(
      "tests/golden/likelihood_golden.npz",
      data=data.numpy(),
      bpd_wrong=bpd_w.numpy(), z_wrong=z_w.numpy(), nfe_wrong=nfe_w,
      bpd_correct=bpd_c.numpy(),
      nelbo_mean=np.mean(nelbos, axis=0),
      nelbo_std=np.std(nelbos, axis=0),
  )
  print("wrote tests/golden/likelihood_golden.npz")
  print("bpd wrong:", bpd_w.numpy(), "nfe:", nfe_w)
  print("bpd correct:", bpd_c.numpy())
  print("nelbo mean:", np.mean(nelbos, axis=0))


if __name__ == "__main__":
  main()
