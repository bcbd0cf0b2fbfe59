"""Offline golden-value generator: runs the REFERENCE (torch, CPU) SDE
library at /root/reference and dumps numerical fixtures for parity tests.

This script is development tooling only — it is not part of the framework
and is never imported by it. The generated .npz files under tests/golden/
are the committed artifacts; tests compare our JAX implementations against
them without needing torch or the reference checkout.

Usage: python tools/make_sde_goldens.py
"""

import sys

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

import sde_lib  # reference module

OUT = "tests/golden/sde_golden.npz"


def main():
  torch.manual_seed(0)
  t = torch.tensor([1e-5, 1e-4, 1e-3, 1e-2, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0],
                   dtype=torch.float32)
  x = torch.randn(10, 3, 8, 8)
  out = {"t": t.numpy(), "x": x.numpy()}

  vp = sde_lib.VPSDE(truncation_time=1e-5, beta_min=0.1, beta_max=20, N=1000)
  mean, std = vp.marginal_prob(x, t)
  drift, diff = vp.sde(x, t)
  out["vp_mean"] = mean.numpy()
  out["vp_std"] = std.numpy()
  out["vp_drift"] = drift.numpy()
  out["vp_diffusion"] = diff.numpy()
  out["vp_prior_logp"] = vp.prior_logp(x).numpy()
  out["vp_antiderivative"] = vp.antiderivative(t).numpy()
  out["vp_antiderivative_stab"] = vp.antiderivative(t, 1e-3).numpy()
  f, G = vp.discretize(x, t)
  out["vp_disc_f"] = f.numpy()
  out["vp_disc_G"] = G.numpy()
  nt = torch.clamp(t - 1e-3, min=0.0)
  f2, G2 = vp.discretize(x, t, nt)
  out["vp_disc_cont_f"] = f2.numpy()
  out["vp_disc_cont_G"] = G2.numpy()
  # importance sampler: check the inverse CDF at fixed u by re-deriving t(u)
  u = torch.linspace(0.01, 0.99, 17)
  Z = vp.normalizing_constant(torch.tensor(1e-5))
  bd = vp.beta_1 - vp.beta_0
  t_is = (-vp.beta_0 + torch.sqrt(
      vp.beta_0 ** 2 + 2 * bd *
      torch.log(1. + torch.exp(Z * u + vp.antiderivative(torch.tensor(1e-5)))))) / bd
  out["vp_is_u"] = u.numpy()
  out["vp_is_t"] = t_is.numpy()
  out["vp_is_Z"] = Z.numpy()

  sub = sde_lib.subVPSDE(truncation_time=1e-5, beta_min=0.1, beta_max=20, N=1000)
  mean, std = sub.marginal_prob(x, t)
  drift, diff = sub.sde(x, t)
  out["sub_mean"] = mean.numpy()
  out["sub_std"] = std.numpy()
  out["sub_drift"] = drift.numpy()
  out["sub_diffusion"] = diff.numpy()

  ve = sde_lib.VESDE(sigma_min=0.01, sigma_max=50, N=1000)
  mean, std = ve.marginal_prob(x, t)
  drift, diff = ve.sde(x, t)
  out["ve_std"] = std.numpy()
  out["ve_diffusion"] = diff.numpy()
  out["ve_prior_logp"] = ve.prior_logp(x).numpy()
  out["ve_antiderivative"] = ve.antiderivative(t).numpy()
  f, G = ve.discretize(x, t)
  out["ve_disc_G"] = G.numpy()
  out["ve_disc_cont_G"] = ve.discretize(x, t, torch.zeros_like(t))[1].numpy()
  out["ve_is_t"] = (1e-5 + (ve.normalizing_constant(torch.tensor(1e-5)) * u)
                    / (2. * (np.log(50.) - np.log(0.01)))).numpy()

  # reciprocal VE with the uncsnpp_st.py constants (sigma_min=1e-3, eta=1e-3)
  rve = sde_lib.reciprocal_VESDE(eta=1e-3, sigma_min=1e-3, sigma_max=50, N=1000)
  t_r = torch.tensor([1e-5, 3e-5, 1e-4, 1e-3, 1e-2, 0.1, 0.5, 1.0],
                     dtype=torch.float32)
  x_r = torch.randn(8, 3, 8, 8)
  mean, std = rve.marginal_prob(x_r, t_r)
  drift, diff = rve.sde(x_r, t_r)
  out["rve_t"] = t_r.numpy()
  out["rve_x"] = x_r.numpy()
  out["rve_std"] = std.numpy()
  out["rve_diffusion"] = diff.numpy()
  out["rve_consts"] = np.array([rve.base_sigma, rve.const, rve.base_sigma_2,
                                rve.const_2], dtype=np.float64)
  f, G = rve.discretize(x_r, t_r, next_t=torch.clamp(t_r - 1e-5, min=0.0))
  out["rve_disc_G"] = G.numpy()
  time_fixed = torch.linspace(1., 1. / 1e-5, 9)
  out["rve_difftime_from_recip"] = (1. / time_fixed).numpy()

  # eta=1e-5 variant (celebahq config)
  rve2 = sde_lib.reciprocal_VESDE(eta=1e-5, sigma_min=0.01, sigma_max=348, N=2000)
  mean, std = rve2.marginal_prob(x_r, t_r)
  out["rve2_std"] = std.numpy()
  out["rve2_consts"] = np.array([rve2.base_sigma, rve2.const, rve2.base_sigma_2,
                                 rve2.const_2], dtype=np.float64)

  np.savez(OUT, **out)
  print(f"wrote {OUT}: {sorted(out)}")


if __name__ == "__main__":
  main()
