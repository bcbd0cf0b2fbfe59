"""Single-update parity for the STOCHASTIC sampler components vs the
reference torch implementations, with ported weights and pinned noise
(goldens from tools/make_update_fn_goldens.py).

Completes the sampler-parity matrix beyond the deterministic end-to-end
trajectories (test_sampler_parity.py): ancestral sampling (VP + VE
discretizations), stochastic Euler-Maruyama / reverse-diffusion, the
SNR-adaptive Langevin corrector, and annealed Langevin dynamics.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.models.score import get_score_fn
from soft_truncation_tpu.sample import get_corrector, get_predictor
from soft_truncation_tpu.sde import ReverseSDE, get_sde
from soft_truncation_tpu.utils.torch_port import port_ncsnpp_state_dict

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")

DDPMPP = dict(resblock_type="ddpm", embedding_type="positional")
VE_MODEL = dict(fir=True, scale_by_sigma=True)

CASES = {
    "vp_ancestral": (DDPMPP, "vpsde", "predictor", "ancestral_sampling"),
    "ve_ancestral": (VE_MODEL, "vesde", "predictor", "ancestral_sampling"),
    "vp_em_stoch": (DDPMPP, "vpsde", "predictor", "euler_maruyama"),
    "vp_rd_stoch": (DDPMPP, "vpsde", "predictor", "reverse_diffusion"),
    "vp_langevin": (DDPMPP, "vpsde", "corrector", "langevin"),
    "ve_langevin": (VE_MODEL, "vesde", "corrector", "langevin"),
    "ve_ald": (VE_MODEL, "vesde", "corrector", "ald"),
}

SNR = 0.16


def make_config(model_ov, sde_name):
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
  model.update(model_ov)
  override(config, {
      "model": model,
      "training": dict(sde=sde_name, continuous=True, truncation_time=1e-5,
                       ddpm_score=sde_name == "vpsde",
                       unbounded_parametrization=False,
                       stabilizing_constant=1e-3),
      "data": dict(image_size=16, centered=True),
  })
  return config


@pytest.mark.parametrize("name", list(CASES))
def test_update_fn_parity(name, monkeypatch):
  gold = np.load(os.path.join(GOLD_DIR, f"updatefn_golden_{name}.npz"))
  model_ov, sde_name, kind, component = CASES[name]
  config = make_config(model_ov, sde_name)

  sde = get_sde(config)
  model = create_model(config)

  x = jnp.asarray(np.transpose(gold["x"], (0, 2, 3, 1)))
  z = jnp.asarray(np.transpose(gold["z"], (0, 2, 3, 1)))
  t_vec = jnp.full((x.shape[0],), float(gold["t"]))

  variables = model.init({"params": jax.random.PRNGKey(0)}, x, t_vec,
                         train=False)
  sd = {k[4:]: gold[k] for k in gold.files if k.startswith("sd::")}
  ported = port_ncsnpp_state_dict(sd, config)
  init_paths = {jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
  ported_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(ported)[0]}
  assert init_paths == ported_paths
  params = jax.tree.map(jnp.asarray, ported)

  orig_normal = jax.random.normal
  monkeypatch.setattr(
      jax.random, "normal",
      lambda key, shape=(), *a, **k: z if tuple(shape) == x.shape
      else orig_normal(key, shape, *a, **k))

  score_fn = get_score_fn(config, sde, model, params, train=False,
                          continuous=True)
  if kind == "predictor":
    fn = get_predictor(component)
    rsde = ReverseSDE(sde, score_fn, probability_flow=False, lambda_=1.0)
    x_out, x_mean = fn(rsde, x, t_vec, jax.random.PRNGKey(1))
  else:
    fn = get_corrector(component)
    x_out, x_mean = fn(sde, score_fn, x, t_vec, jax.random.PRNGKey(1),
                       SNR, 1)

  np.testing.assert_allclose(
      np.asarray(x_mean), np.transpose(gold["x_mean"], (0, 2, 3, 1)),
      rtol=2e-3, atol=2e-4)
  np.testing.assert_allclose(
      np.asarray(x_out), np.transpose(gold["x_out"], (0, 2, 3, 1)),
      rtol=2e-3, atol=2e-4)
