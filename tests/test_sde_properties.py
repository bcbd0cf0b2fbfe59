"""Property-based self-consistency tests for the SDE library
(hypothesis over times/parameters, CPU).

The golden tests (test_sde.py) pin VALUES against the reference; these
pin the MATH against itself — identities any correct linear-SDE
implementation must satisfy regardless of parameters:

  * Fokker–Planck moment identity: the conditional variance v(t) from
    ``marginal_prob`` must satisfy dv/dt = 2·a(t)·v + g(t)² where
    a(t)·x is the drift and g(t) the diffusion from ``sde()``. One
    autodiff line catches any coefficient typo in either method.
    (Reference quirk: reciprocal-VE's g² has its tiny second term
    sign-flipped — PARITY.md bug #13 — but it sits ~11 orders below
    the first term, far inside the float32 tolerance here.)
  * Mean identity: dm/dt = a(t)·m for the same a(t).
  * ``perturb`` is exactly mean + std·z for the z it returns.
  * ``prior_logp`` equals the analytic diagonal-Gaussian log-density of
    the prior that ``prior_sampling`` draws from.
  * Diffusion-time samplers land in [t_min, T]; the Soft-Truncation
    t_min inverse-CDF lands in [eps, T] and is monotone in u
    (reference sde_lib.py:191-207,314-324,421-430).
  * VE/RVE ``discretize`` G² equals σ(t)² − σ(next_t)², with the RVE
    expm1 form matching a float64 oracle on adjacent grid times where
    naive float32 cancels catastrophically (PARITY.md bug #4).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from soft_truncation_tpu.sde.core import (ReciprocalVESDE, SubVPSDE, VESDE,
                                          VPSDE)

SDES = {
    "vp": VPSDE(),
    "subvp": SubVPSDE(),
    "ve": VESDE(),
    "rve": ReciprocalVESDE(),
}

# Hypothesis + jax: keep examples modest and deadline off (first trace
# of a grad can take ~100ms). derandomize: this suite is a commit gate —
# a property falsified only by a lucky draw should fail every run or
# none, not poison an unrelated commit.
_SETTINGS = dict(max_examples=25, deadline=None, derandomize=True)

times = st.floats(min_value=0.05, max_value=0.95, allow_nan=False)


def _a_of_t(sde, t):
  """Drift coefficient a(t) from drift(x, t) = a(t)·x, probed at x=1."""
  drift, _ = sde.sde(jnp.ones((1, 1, 1, 1)), jnp.full((1,), t))
  return drift.reshape(())  # a(t)·1


def _g2_of_t(sde, t):
  _, diffusion = sde.sde(jnp.ones((1, 1, 1, 1)), jnp.full((1,), t))
  return (jnp.asarray(diffusion) ** 2).reshape(())


@pytest.mark.parametrize("name", list(SDES))
@settings(**_SETTINGS)
@given(t=times)
def test_fokker_planck_variance_identity(name, t):
  sde = SDES[name]

  def var(tt):
    return sde.marginal_prob(jnp.ones((1, 1, 1, 1)), jnp.full((1,), tt)
                             )[1].reshape(()) ** 2

  dv_dt = jax.grad(var)(jnp.float32(t))
  rhs = 2.0 * _a_of_t(sde, t) * var(t) + _g2_of_t(sde, t)
  np.testing.assert_allclose(float(dv_dt), float(rhs), rtol=2e-3,
                             err_msg=f"{name}: dv/dt != 2av+g^2 at t={t}")


@pytest.mark.parametrize("name", list(SDES))
@settings(**_SETTINGS)
@given(t=times)
def test_mean_identity(name, t):
  sde = SDES[name]

  def mean(tt):
    return sde.marginal_prob(jnp.ones((1, 1, 1, 1)), jnp.full((1,), tt)
                             )[0].reshape(())

  dm_dt = jax.grad(mean)(jnp.float32(t))
  rhs = _a_of_t(sde, t) * mean(t)
  np.testing.assert_allclose(float(dm_dt), float(rhs), rtol=2e-3, atol=1e-6,
                             err_msg=f"{name}: dm/dt != a·m at t={t}")


@pytest.mark.parametrize("name", list(SDES))
@settings(**_SETTINGS)
@given(t=times, seed=st.integers(0, 2**31 - 1))
def test_perturb_is_mean_plus_std_noise(name, t, seed):
  sde = SDES[name]
  key = jax.random.PRNGKey(seed)
  x = jax.random.normal(jax.random.PRNGKey(seed + 1), (2, 4, 4, 3))
  tt = jnp.full((2,), t)
  xt, z, std = sde.perturb(key, x, tt)
  mean, std2 = sde.marginal_prob(x, tt)
  np.testing.assert_allclose(np.asarray(std), np.asarray(std2), rtol=0)
  np.testing.assert_allclose(
      np.asarray(xt), np.asarray(mean + std.reshape(-1, 1, 1, 1) * z),
      rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("name", list(SDES))
def test_prior_logp_matches_analytic_gaussian(name):
  sde = SDES[name]
  z = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3)) * 3.0
  got = np.asarray(sde.prior_logp(z))
  # Prior std: 1 for VP/subVP (unit Gaussian), sigma_max for VE/RVE —
  # matching prior_sampling's scaling in each class.
  s = getattr(sde, "sigma_max", 1.0) if name in ("ve", "rve") else 1.0
  d = 8 * 8 * 3
  zz = np.asarray(z, np.float64).reshape(4, -1)
  want = -d / 2.0 * np.log(2 * np.pi * s ** 2) - (zz ** 2).sum(-1) / (2 * s ** 2)
  np.testing.assert_allclose(got, want, rtol=1e-5)
  # And prior_sampling really has that std (statistically, 64k draws).
  draws = np.asarray(sde.prior_sampling(jax.random.PRNGKey(1), (16, 64, 64, 1)))
  np.testing.assert_allclose(draws.std(), s, rtol=0.02)


@pytest.mark.parametrize("name", list(SDES))
@settings(**_SETTINGS)
@given(t_min=st.floats(min_value=1e-5, max_value=0.5), seed=st.integers(0, 2**31 - 1))
def test_uniform_diffusion_time_in_range(name, t_min, seed):
  sde = SDES[name]
  t, Z = sde.sample_diffusion_time(jax.random.PRNGKey(seed), 64,
                                   jnp.float32(t_min),
                                   importance_sampling=False)
  t = np.asarray(t)
  assert (t >= t_min - 1e-6).all() and (t <= sde.T + 1e-6).all()
  assert float(Z) == 1.0


@pytest.mark.parametrize("name", ["vp", "ve", "rve"])  # subVP: no IS sampler
@settings(**_SETTINGS)
@given(t_min=st.floats(min_value=1e-4, max_value=0.5), seed=st.integers(0, 2**31 - 1))
def test_importance_diffusion_time_in_range(name, t_min, seed):
  sde = SDES[name]
  t, Z = sde.sample_diffusion_time(jax.random.PRNGKey(seed), 64,
                                   jnp.float32(t_min),
                                   importance_sampling=True)
  t = np.asarray(t)
  assert np.isfinite(t).all() and float(Z) > 0.0
  assert (t >= t_min - 1e-5).all() and (t <= sde.T + 1e-5).all(), (
      f"{name}: IS times escaped [t_min, T]: [{t.min()}, {t.max()}]")


@settings(**_SETTINGS)
@given(k=st.floats(min_value=0.5, max_value=3.0),
       eps=st.floats(min_value=1e-5, max_value=1e-2),
       seed=st.integers(0, 2**31 - 1))
def test_sample_t_min_in_range(k, eps, seed):
  sde = SDES["vp"]
  v = float(sde.sample_t_min(jax.random.PRNGKey(seed), k, eps))
  assert eps - 1e-9 <= v <= sde.T + 1e-6


@pytest.mark.parametrize("name,k", [("vp", 1.8), ("vp", 1.0), ("rve", 1.8)])
def test_sample_t_min_matches_oracle_and_monotone(name, k):
  """Drives the REAL sde.sample_t_min (sde/core.py:105-115, :437-441):
  recover the u each key draws (jax.random.uniform of the same key),
  compare against an independent numpy inverse-CDF oracle at that u, and
  assert the (u, t_min) pairs are monotone — so a sign/exponent typo in
  the implementation fails here, not just in a re-derived formula."""
  sde = SDES[name]
  eps = 1e-4

  def oracle(u):
    if name == "rve":  # uniform in reciprocal time (sde_lib.py:425-430)
      return 1.0 / (u * (1.0 / eps - 1.0 / sde.T) + 1.0 / sde.T)
    if k == 1.0:
      return eps ** (1.0 - u)
    return eps / (1.0 - u * (1.0 - eps ** (k - 1.0))) ** (1.0 / (k - 1.0))

  us, vals = [], []
  for seed in range(64):
    key = jax.random.PRNGKey(seed)
    u = float(jax.random.uniform(key, ()))
    got = float(sde.sample_t_min(key, k, eps))
    np.testing.assert_allclose(got, oracle(u), rtol=1e-5,
                               err_msg=f"{name} k={k} seed={seed} u={u}")
    us.append(u)
    vals.append(got)

  order = np.argsort(us)
  diffs = np.diff(np.asarray(vals)[order])
  sign = -1.0 if name == "rve" else 1.0  # RVE inverse CDF decreases in u
  assert np.all(sign * diffs > 0), f"{name} t_min(u) not monotone"
  # endpoint limits of the oracle the implementation must share
  np.testing.assert_allclose([oracle(0.0), oracle(1.0)],
                             [eps, sde.T] if name != "rve"
                             else [sde.T, eps], rtol=1e-6)


@pytest.mark.parametrize("name", ["ve", "rve"])
@settings(**_SETTINGS)
@given(i=st.integers(min_value=1, max_value=998))
def test_discretize_matches_variance_difference(name, i):
  """G(t, next_t)² == σ(t)² − σ(next_t)² on adjacent 1000-grid times —
  the regime where naive float32 subtraction cancels (bug #4); the RVE
  expm1 form must match a float64 oracle."""
  sde = SDES[name]
  t = jnp.full((1,), (i + 1) / 1000.0)
  nt = jnp.full((1,), i / 1000.0)
  _, G = sde.discretize(jnp.zeros((1, 1, 1, 1)), t, next_t=nt)
  got = float(jnp.asarray(G).reshape(())) ** 2

  if name == "ve":
    s = lambda tt: float(sde.sigma_min) * (sde.sigma_max / sde.sigma_min) ** tt
    want = s((i + 1) / 1000.0) ** 2 - s(i / 1000.0) ** 2
  else:
    b1, c1 = sde.base_sigma, sde.const      # host float64 already
    b2, c2 = sde.base_sigma_2, sde.const_2
    var = lambda tt: c1 * b1 ** (2.0 / tt) + c2 * b2 ** (2.0 / tt)
    want = var((i + 1) / 1000.0) - var(i / 1000.0)
  np.testing.assert_allclose(got, want, rtol=5e-3,
                             err_msg=f"{name} adjacent-grid G^2 at i={i}")
