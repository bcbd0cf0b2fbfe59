"""Cross-framework likelihood parity on the tiny ported ddpmpp model.

The probability-flow latent z and (up to Hutchinson noise) bpd must match
the reference torch+scipy implementation (tools/make_likelihood_goldens.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from soft_truncation_tpu.likelihood import get_elbo_fn, get_likelihood_fn
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.sde import get_sde
from soft_truncation_tpu.utils.torch_port import port_ncsnpp_state_dict
from tests.test_ncsnpp_parity import CASES, tiny_config

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _setup():
  gold_model = np.load(os.path.join(GOLD_DIR, "ncsnpp_golden_ddpmpp.npz"))
  gold = np.load(os.path.join(GOLD_DIR, "likelihood_golden.npz"))
  config = tiny_config(**CASES["ddpmpp"])
  config.training.sde = "vpsde"
  config.eval.probability_flow = True
  config.eval.lambda_ = 0.0
  model = create_model(config)
  sd = {k[4:]: gold_model[k] for k in gold_model.files
        if k.startswith("sd::")}
  params = jax.tree.map(jnp.asarray, port_ncsnpp_state_dict(sd, config))
  sde = get_sde(config)
  data = jnp.asarray(np.transpose(gold["data"], (0, 2, 3, 1)))
  return config, sde, model, params, data, gold


def test_latent_and_bpd_parity_wrong_mode():
  config, sde, model, params, data, gold = _setup()
  inverse_scaler = lambda x: (x + 1.0) / 2.0
  likelihood_fn = get_likelihood_fn(config, sde, inverse_scaler,
                                    rtol=1e-4, atol=1e-4)
  bpd, z, nfe = likelihood_fn(model, params, data, jax.random.PRNGKey(0),
                              mode="wrong", eps=1e-5)
  # latent z is deterministic: must match the reference's scipy RK45 result
  z_ref = np.transpose(gold["z_wrong"], (0, 2, 3, 1))
  np.testing.assert_allclose(np.asarray(z), z_ref, rtol=5e-3, atol=5e-3)
  # bpd differs only through the Hutchinson draw; for this model the
  # reference per-sample spread is ~1e-4, so mean agreement is tight
  np.testing.assert_allclose(np.asarray(bpd).mean(),
                             gold["bpd_wrong"].mean(), rtol=2e-3)
  assert int(nfe) > 10


def test_bpd_parity_correct_mode():
  config, sde, model, params, data, gold = _setup()
  inverse_scaler = lambda x: (x + 1.0) / 2.0
  likelihood_fn = get_likelihood_fn(config, sde, inverse_scaler,
                                    rtol=1e-4, atol=1e-4)
  bpds = []
  for i in range(4):
    bpd, _, _ = likelihood_fn(model, params, data,
                              jax.random.PRNGKey(i), mode="correct",
                              eps=1e-5)
    bpds.append(np.asarray(bpd))
  ours = np.mean(bpds)
  ref = gold["bpd_correct"].mean()
  assert abs(ours - ref) / ref < 0.01, (ours, ref)


def test_nelbo_parity_statistical():
  config, sde, model, params, data, gold = _setup()
  inverse_scaler = lambda x: (x + 1.0) / 2.0
  elbo_fn = get_elbo_fn(config, sde, inverse_scaler=inverse_scaler)
  vals = []
  for i in range(16):
    nelbo, residual = elbo_fn(model, params, data, jax.random.PRNGKey(i),
                              eps=1e-5)
    vals.append(np.asarray(nelbo + residual))
  ours_mean = np.mean(vals, axis=0)
  ref_mean = gold["nelbo_mean"]
  ref_std = gold["nelbo_std"]
  # per-example means agree within a few reference std-errors
  tol = 4 * ref_std / np.sqrt(16) + 0.05 * np.abs(ref_mean)
  assert np.all(np.abs(ours_mean - ref_mean) < tol), (
      ours_mean, ref_mean, tol)
