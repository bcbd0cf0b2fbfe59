"""Loss-value parity goldens: runs the REFERENCE torch continuous
score-matching loss (losses.py:61-168) on tiny models with PINNED
randomness (torch.rand / torch.randn_like monkeypatched) and dumps
state_dict + batch + (t, Z, z) draws + per-example losses.

Covers numerically, across frameworks: IS weighting (losses.py:122-124),
likelihood g^2 weighting (:126-129), default sigma^2 weighting
(:130-132), and the reconstruction loss with both decoders — lossless
discretized-Gaussian (:82-99,148-151) and Gaussian entropy form
(:152-159) — against VP, subVP and VE SDEs with their score wrappings.

Development tooling only; artifact = tests/golden/loss_golden_<name>.npz.
Usage: python tools/make_loss_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import torch

from make_ncsnpp_goldens import base_config  # noqa: E402  (installs shims)

import losses as ref_losses  # noqa: E402  (reference)
import sde_lib as ref_sde_lib  # noqa: E402  (reference)
from models import ncsnpp  # noqa: E402  (reference)

BATCH = (4, 3, 16, 16)
T_MIN = 0.01

DDPMPP = dict(resblock_type="ddpm", embedding_type="positional")

CASES = {
    # name: (model overrides, training overrides, data overrides)
    "vp_is": (DDPMPP,
              dict(sde="vpsde", ddpm_score=True, importance_sampling=True),
              {}),
    "vp_lw_recon_lossless": (DDPMPP,
                             dict(sde="vpsde", ddpm_score=True,
                                  importance_sampling=False,
                                  likelihood_weighting=True,
                                  reconstruction_loss=True,
                                  reduce_mean=False),
                             dict(dequantization="lossless")),
    "vp_recon_gauss": (DDPMPP,
                       dict(sde="vpsde", ddpm_score=True,
                            importance_sampling=False,
                            reconstruction_loss=True),
                       dict(dequantization="uniform")),
    # NOTE: no subVP case — reference subVPSDE inherits the abstract
    # 2-arg SDE.get_diffusion_time (sde_lib.py:53), so get_sde_loss_fn
    # crashes for it (losses.py:113 passes 5 args); no config uses it.
    # Our subVP loss support is a tested superset (tests/test_sde.py).
    "ve_is": (dict(fir=True, scale_by_sigma=True),
              dict(sde="vesde", importance_sampling=True), {}),
    # RVE: the UNCSN++ flagship SDE; exercises the reciprocal-VE score
    # wrapping (sigma labels) and its IS time sampler end to end
    "rve_is": (dict(fir=True, scale_by_sigma=True),
               dict(sde="reciprocal_vesde", importance_sampling=True), {}),
}


def full_config(model_ov, train_ov, data_ov):
  config = base_config()
  for k, v in model_ov.items():
    setattr(config.model, k, v)
  t = config.training
  t.truncation_time = 1e-5
  t.unbounded_parametrization = False
  t.stabilizing_constant = 1e-3
  t.ddpm_score = False
  t.eta = 1e-4
  t.importance_sampling = False
  t.likelihood_weighting = False
  t.reconstruction_loss = False
  t.reduce_mean = True
  for k, v in train_ov.items():
    setattr(config.training, k, v)
  config.data.dequantization = "uniform"
  for k, v in data_ov.items():
    setattr(config.data, k, v)
  return config


# Mixed IS+DDPM step cases (reference losses.py:295-320, step_fn_mixed),
# flag combos from the two released mixed configs:
#   ddpmpp_fid_st_deepest.py: importance_sampling=False, w=100, unbalanced
#   ddpmpp_nll_st_deepest.py: importance_sampling=True, w=0.01, balanced
# name: (config importance_sampling, ddpm_weight, balanced)
MIXED_CASES = {
    "vp_mixed": (False, 100.0, False),
    "vp_mixed_balanced": (True, 0.01, True),
}
MIXED_BATCH = 8
MIXED_NUM_MICRO = 2


def make_mixed_goldens():
  """Emulates step_fn_mixed's loss computation (losses.py:295-316) with
  pinned randomness: per micro-batch k, an IS-half and a DDPM-half loss
  over the reference's exact slice layout, combined with ddpm_weight and
  the optional per-micro balanced rescale (stop-gradient ratio mean).
  The weighting branch inside loss_fn follows config.training.
  importance_sampling (NOT the per-call argument) — inert for all
  released mixed configs since likelihood_weighting=False makes the IS
  and default formulas identical."""
  orig_rand, orig_randn_like = torch.rand, torch.randn_like
  for name, (cfg_is, ddpm_weight, balanced) in MIXED_CASES.items():
    config = full_config(DDPMPP,
                         dict(sde="vpsde", ddpm_score=True,
                              importance_sampling=cfg_is),
                         {})

    torch.manual_seed(0)
    model = ncsnpp.NCSNpp(config, sde=None)
    model.eval()
    sde = ref_sde_lib.get_sde(config, state=None)

    rng = np.random.RandomState(23)
    batch_np = (rng.rand(MIXED_BATCH, *BATCH[1:]).astype(np.float32) * 2 - 1)
    batch = torch.from_numpy(batch_np)
    half = MIXED_BATCH // (2 * MIXED_NUM_MICRO)  # examples per loss_fn call
    us = [rng.rand(half).astype(np.float32) for _ in range(4)]
    zs = [rng.randn(half, *BATCH[1:]).astype(np.float32) for _ in range(4)]

    u_iter, z_iter = iter(us), iter(zs)
    torch.rand = lambda *s, **k: torch.from_numpy(next(u_iter))
    torch.randn_like = lambda x: torch.from_numpy(next(z_iter))
    try:
      loss_fn = ref_losses.get_sde_loss_fn(config, sde, train=False)
      bs, nm = MIXED_BATCH, MIXED_NUM_MICRO
      losses_ = torch.zeros(bs // 2)
      with torch.no_grad():
        for k in range(nm):
          lo = bs // nm * k
          mid = lo + bs // (2 * nm)
          hi = bs // nm * (k + 1)
          losses_is = loss_fn(model, batch[lo:mid],
                              importance_sampling=True, t_min=T_MIN)
          losses_ddpm = loss_fn(model, batch[mid:hi],
                                importance_sampling=False, t_min=T_MIN)
          if balanced:
            scale = torch.mean(losses_is / losses_ddpm).detach().item()
            losses = losses_is + ddpm_weight * scale * losses_ddpm
          else:
            losses = losses_is + ddpm_weight * losses_ddpm
          losses_[bs // nm // 2 * k: bs // nm // 2 * (k + 1)] = losses
      # re-derive the 4 (t, Z) pairs the pinned draws produced, call order
      # (is0, dd0, is1, dd1), for injection into the JAX side
      tzs = []
      u_iter = iter(us)
      for k in range(nm):
        for is_arg in (True, False):
          t, Z = sde.get_diffusion_time(config, half, "cpu", T_MIN,
                                        importance_sampling=is_arg)
          tzs.append((t.numpy() if torch.is_tensor(t) else np.asarray(t),
                      Z.numpy() if torch.is_tensor(Z) else np.asarray(Z)))
    finally:
      torch.rand, torch.randn_like = orig_rand, orig_randn_like

    out = {
        "batch": batch_np,
        "cfg_is": np.asarray(cfg_is),
        "ddpm_weight": np.asarray(ddpm_weight),
        "balanced": np.asarray(balanced),
        "num_micro": np.asarray(MIXED_NUM_MICRO),
        "t_min": np.asarray(T_MIN),
        "losses": losses_.numpy(),
    }
    for i, ((t, Z), z) in enumerate(zip(tzs, zs)):
      out[f"t{i}"], out[f"Z{i}"], out[f"z{i}"] = t, Z, z
    for k, v in model.state_dict().items():
      out["sd::" + k] = v.numpy()
    path = f"tests/golden/mixed_golden_{name}.npz"
    np.savez(path, **out)
    print(f"wrote {path}  losses={losses_.numpy()}")


def main():
  orig_rand, orig_randn_like = torch.rand, torch.randn_like
  for name, (model_ov, train_ov, data_ov) in CASES.items():
    config = full_config(model_ov, train_ov, data_ov)

    torch.manual_seed(0)
    model = ncsnpp.NCSNpp(config, sde=None)
    model.eval()
    sde = ref_sde_lib.get_sde(config, state=None)

    rng = np.random.RandomState(11)
    batch = (rng.rand(*BATCH).astype(np.float32) * 2 - 1)
    u = rng.rand(BATCH[0]).astype(np.float32)
    zs = [rng.randn(*BATCH).astype(np.float32) for _ in range(2)]

    z_iter = iter(zs)
    torch.rand = lambda *s, **k: torch.from_numpy(u)
    torch.randn_like = lambda x: torch.from_numpy(next(z_iter))
    try:
      loss_fn = ref_losses.get_sde_loss_fn(config, sde, train=False)
      with torch.no_grad():
        losses = loss_fn(model, torch.from_numpy(batch),
                         importance_sampling=config.training.importance_sampling,
                         t_min=T_MIN)
      # re-derive the (t, Z) the pinned torch.rand produced, for injection
      # into the JAX side (whose inverse-CDF is golden-tested separately)
      t, Z = sde.get_diffusion_time(
          config, BATCH[0], "cpu", T_MIN,
          importance_sampling=config.training.importance_sampling)
    finally:
      torch.rand, torch.randn_like = orig_rand, orig_randn_like

    out = {
        "batch": batch,
        "u": u,
        "t": t.numpy() if torch.is_tensor(t) else np.asarray(t),
        "Z": Z.numpy() if torch.is_tensor(Z) else np.asarray(Z),
        "z0": zs[0],
        "z1": zs[1],
        "t_min": np.asarray(T_MIN),
        "losses": losses.numpy(),
    }
    for k, v in model.state_dict().items():
      out["sd::" + k] = v.numpy()
    path = f"tests/golden/loss_golden_{name}.npz"
    np.savez(path, **out)
    print(f"wrote {path}  losses={losses.numpy()}")


if __name__ == "__main__":
  main()
  make_mixed_goldens()
