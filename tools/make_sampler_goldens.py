"""End-to-end sampler parity goldens: runs the REFERENCE torch PC sampler
(sampling.py:365-433) on tiny models in its deterministic configurations
(probability-flow predictors + 'none' corrector, so no RNG enters the
trajectory once the initial x_T is pinned) and dumps state_dict + x_T +
final samples.

Covers, end to end across frameworks: get_score_fn label/scaling wrapping
(models/utils.py:128-190 — t*999 + ddpm_score for VP, the unbounded
antiderivative labels for UDDPM++, sigma labels for VE), reverse-SDE
discretization (sde_lib.py:75-119), the reverse-diffusion and
Euler-Maruyama predictors, the PC loop ordering, and the final denoise
step (sampling.py:402-408, including its next_t=0 continuous-sigma branch
for VE, sde_lib.py:290-303).

Development tooling only; artifact = tests/golden/sampler_golden_<name>.npz.
Usage: python tools/make_sampler_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import torch

# Importing make_ncsnpp_goldens installs the reference-on-CPU shims
# (cpp_extension stub, F.interpolate fix) and puts /root/reference on the
# path; base_config is the shared tiny-model schema.
from make_ncsnpp_goldens import base_config  # noqa: E402

import sampling as ref_sampling  # noqa: E402  (reference)
import sde_lib as ref_sde_lib  # noqa: E402  (reference)
from models import ncsnpp  # noqa: E402  (reference)

EPS = 1e-3
SHAPE = (2, 3, 16, 16)  # NCHW

# VP + positional embedding requires num_scales >= 1000: the reference
# model indexes a length-num_scales sigma table with t*999 labels
# (models/ncsnpp.py:278), exactly as the real configs run it. VE uses
# continuous sigma labels, so a short 8-step trajectory suffices there.
CASES = {
    # name: (model overrides, training overrides, predictor name, sde.N)
    "vp_rd": (dict(resblock_type="ddpm", embedding_type="positional"),
              dict(sde="vpsde", ddpm_score=True), "reverse_diffusion", 1000),
    "vp_unbounded": (dict(resblock_type="ddpm", embedding_type="positional"),
                     dict(sde="vpsde", ddpm_score=True,
                          unbounded_parametrization=True),
                     "reverse_diffusion", 1000),
    "vp_em": (dict(resblock_type="ddpm", embedding_type="positional"),
              dict(sde="vpsde", ddpm_score=True), "euler_maruyama", 1000),
    "ve_rd": (dict(fir=True, progressive_input="residual",
                   scale_by_sigma=True),
              dict(sde="vesde"), "reverse_diffusion", 8),
}

PREDICTORS = {
    "reverse_diffusion": ref_sampling.ReverseDiffusionPredictor,
    "euler_maruyama": ref_sampling.EulerMaruyamaPredictor,
}


def full_config(model_overrides, training_overrides, n_steps):
  config = base_config()
  for k, v in model_overrides.items():
    setattr(config.model, k, v)
  config.model.num_scales = n_steps
  t = config.training
  t.truncation_time = 1e-5
  t.unbounded_parametrization = False
  t.stabilizing_constant = 1e-3
  t.ddpm_score = False
  t.eta = 1e-4
  for k, v in training_overrides.items():
    setattr(config.training, k, v)
  config.training.sde = config.training.sde  # keep ml_collections happy
  return config


def main():
  for name, (model_ov, train_ov, predictor, n_steps) in CASES.items():
    config = full_config(model_ov, train_ov, n_steps)

    torch.manual_seed(0)
    model = ncsnpp.NCSNpp(config, sde=None)
    model.eval()

    sde = ref_sde_lib.get_sde(config, state=None)
    rng = np.random.RandomState(7)
    x_T = rng.randn(*SHAPE).astype(np.float32)
    if config.training.sde == "vesde":
      x_T = x_T * config.model.sigma_max
    # Pin the initial sample so the (otherwise RNG-free, probability-flow
    # + none-corrector) trajectory is fully deterministic.
    sde.prior_sampling = lambda shape: torch.from_numpy(x_T)

    sampler = ref_sampling.get_pc_sampler(
        config, sde, SHAPE,
        predictor=PREDICTORS[predictor],
        corrector=ref_sampling.NoneCorrector,
        inverse_scaler=lambda x: x,
        snr=0.16, n_steps=1,
        probability_flow=True, continuous=True, denoise=True,
        eps=EPS, device="cpu")
    with torch.no_grad():
      samples, nfe = sampler(model)

    out = {
        "x_T": x_T,
        "y": samples.numpy(),
        "nfe": np.asarray(nfe),
        "n_steps": np.asarray(n_steps),
        "eps": np.asarray(EPS),
    }
    for k, v in model.state_dict().items():
      out["sd::" + k] = v.numpy()
    path = f"tests/golden/sampler_golden_{name}.npz"
    np.savez(path, **out)
    print(f"wrote {path}  (|y| mean {np.abs(samples.numpy()).mean():.4f})")


if __name__ == "__main__":
  main()
