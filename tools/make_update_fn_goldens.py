"""Single-update parity goldens for the STOCHASTIC sampler components:
runs one reference predictor/corrector update (sampling.py:186-341) with
PINNED noise (torch.randn_like monkeypatched) and dumps state_dict +
(x, t, z) + both outputs (x, x_mean).

Together with the deterministic end-to-end trajectories
(make_sampler_goldens.py), this completes numeric cross-framework parity
for the full predictor/corrector zoo: ancestral sampling (VP + VE
discretizations), stochastic Euler-Maruyama and reverse-diffusion, the
SNR-adaptive Langevin corrector, and annealed Langevin dynamics.

Development tooling only; artifact = tests/golden/updatefn_golden_<name>.npz.
Usage: python tools/make_update_fn_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import torch

from make_ncsnpp_goldens import base_config  # noqa: E402  (installs shims)

import sampling as ref_sampling  # noqa: E402  (reference)
import sde_lib as ref_sde_lib  # noqa: E402  (reference)
from models import ncsnpp  # noqa: E402  (reference)
from models import utils as ref_mutils  # noqa: E402  (reference)

SHAPE = (2, 3, 16, 16)

DDPMPP = dict(resblock_type="ddpm", embedding_type="positional")
VE_MODEL = dict(fir=True, scale_by_sigma=True)

CASES = {
    # name: (model ov, sde name, kind, component, t scalar)
    "vp_ancestral": (DDPMPP, "vpsde", "predictor", "ancestral_sampling", 0.5),
    "ve_ancestral": (VE_MODEL, "vesde", "predictor", "ancestral_sampling",
                     0.3),
    "vp_em_stoch": (DDPMPP, "vpsde", "predictor", "euler_maruyama", 0.5),
    "vp_rd_stoch": (DDPMPP, "vpsde", "predictor", "reverse_diffusion", 0.5),
    "vp_langevin": (DDPMPP, "vpsde", "corrector", "langevin", 0.5),
    "ve_langevin": (VE_MODEL, "vesde", "corrector", "langevin", 0.3),
    "ve_ald": (VE_MODEL, "vesde", "corrector", "ald", 0.3),
}

PREDICTORS = {
    "ancestral_sampling": ref_sampling.AncestralSamplingPredictor,
    "euler_maruyama": ref_sampling.EulerMaruyamaPredictor,
    "reverse_diffusion": ref_sampling.ReverseDiffusionPredictor,
}
CORRECTORS = {
    "langevin": ref_sampling.LangevinCorrector,
    "ald": ref_sampling.AnnealedLangevinDynamics,
}

SNR = 0.16


def main():
  orig_randn_like = torch.randn_like
  for name, (model_ov, sde_name, kind, component, t_val) in CASES.items():
    config = base_config()
    for k, v in model_ov.items():
      setattr(config.model, k, v)
    t = config.training
    t.sde = sde_name
    t.truncation_time = 1e-5
    t.unbounded_parametrization = False
    t.stabilizing_constant = 1e-3
    t.ddpm_score = sde_name == "vpsde"
    t.eta = 1e-4

    torch.manual_seed(0)
    model = ncsnpp.NCSNpp(config, sde=None)
    model.eval()
    sde = ref_sde_lib.get_sde(config, state=None)
    score_fn = ref_mutils.get_score_fn(config, sde, model, train=False,
                                       continuous=True)

    rng = np.random.RandomState(13)
    x = rng.randn(*SHAPE).astype(np.float32)
    if sde_name == "vesde":
      x = x * 5.0
    z = rng.randn(*SHAPE).astype(np.float32)
    vec_t = torch.full((SHAPE[0],), t_val)

    torch.randn_like = lambda a: torch.from_numpy(z)
    try:
      with torch.no_grad():
        if kind == "predictor":
          obj = PREDICTORS[component](config, sde, score_fn,
                                      probability_flow=False)
          x_out, x_mean = obj.update_fn(torch.from_numpy(x), vec_t)
        else:
          obj = CORRECTORS[component](sde, score_fn, SNR, 1)
          x_out, x_mean = obj.update_fn(torch.from_numpy(x), vec_t)
    finally:
      torch.randn_like = orig_randn_like

    rec = {"x": x, "z": z, "t": np.asarray(t_val),
           "x_out": x_out.numpy(), "x_mean": x_mean.numpy()}
    for k, v in model.state_dict().items():
      rec["sd::" + k] = v.numpy()
    path = f"tests/golden/updatefn_golden_{name}.npz"
    np.savez(path, **rec)
    print(f"wrote {path}")


if __name__ == "__main__":
  main()
