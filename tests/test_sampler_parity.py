"""End-to-end cross-framework sampler parity: our PC sampler, run with
reference-ported weights from the reference's own initial x_T, must
reproduce the reference torch sampler's final samples (goldens generated
by tools/make_sampler_goldens.py from reference sampling.py:365-433).

These are the reference sampler's deterministic configurations
(probability-flow predictors + 'none' corrector), so the entire
trajectory — score wrapping, reverse-SDE discretization, predictor
updates, final denoise step — is compared numerically, not just one
forward pass.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.sample import get_sampling_fn
from soft_truncation_tpu.sde import get_sde
from soft_truncation_tpu.utils.torch_port import port_ncsnpp_state_dict

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    # name: (model overrides, training overrides, predictor)
    "vp_rd": (dict(resblock_type="ddpm", embedding_type="positional"),
              dict(sde="vpsde", ddpm_score=True), "reverse_diffusion"),
    "vp_unbounded": (dict(resblock_type="ddpm", embedding_type="positional"),
                     dict(sde="vpsde", ddpm_score=True,
                          unbounded_parametrization=True),
                     "reverse_diffusion"),
    "vp_em": (dict(resblock_type="ddpm", embedding_type="positional"),
              dict(sde="vpsde", ddpm_score=True), "euler_maruyama"),
    "ve_rd": (dict(fir=True, progressive_input="residual",
                   scale_by_sigma=True),
              dict(sde="vesde"), "reverse_diffusion"),
}


def make_config(model_ov, train_ov, predictor, n_steps):
  config = default_config("cifar10")
  model = dict(
      name="ncsnpp", scale_by_sigma=False, ema_rate=0.999,
      normalization="GroupNorm", nonlinearity="swish", nf=16,
      ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
      resamp_with_conv=True, conditional=True, fir=False,
      fir_kernel=[1, 3, 3, 1], skip_rescale=True, resblock_type="biggan",
      progressive="none", progressive_input="none",
      progressive_combine="sum", init_scale=0.0,
      embedding_type="fourier", fourier_scale=16, conv_size=3,
      num_scales=n_steps)
  model.update(model_ov)
  training = dict(continuous=True, truncation_time=1e-5,
                  stabilizing_constant=1e-3, ddpm_score=False,
                  unbounded_parametrization=False)
  training.update(train_ov)
  override(config, {
      "model": model,
      "training": training,
      "data": dict(image_size=16, centered=True),
      "sampling": dict(method="pc", predictor=predictor, corrector="none",
                       probability_flow=True, noise_removal=True,
                       snr=0.16, n_steps_each=1),
  })
  return config


@pytest.mark.parametrize("name", list(CASES))
def test_pc_sampler_parity(name, monkeypatch):
  gold = np.load(os.path.join(GOLD_DIR, f"sampler_golden_{name}.npz"))
  model_ov, train_ov, predictor = CASES[name]
  n_steps = int(gold["n_steps"])
  config = make_config(model_ov, train_ov, predictor, n_steps)

  sde = get_sde(config)
  model = create_model(config)

  x_T = jnp.asarray(np.transpose(gold["x_T"], (0, 2, 3, 1)))  # NHWC
  monkeypatch.setattr(type(sde), "prior_sampling",
                      lambda self, key, shape: x_T)

  # port reference weights
  dummy_x = jnp.zeros_like(x_T)
  dummy_t = jnp.full((x_T.shape[0],), 1.0)
  variables = model.init({"params": jax.random.PRNGKey(0)}, dummy_x, dummy_t,
                         train=False)
  sd = {k[4:]: gold[k] for k in gold.files if k.startswith("sd::")}
  ported = port_ncsnpp_state_dict(sd, config)
  init_paths = {jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
  ported_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(ported)[0]}
  assert init_paths == ported_paths
  params = jax.tree.map(jnp.asarray, ported)

  sampler = get_sampling_fn(config, sde, x_T.shape,
                            inverse_scaler=lambda x: x,
                            eps=float(gold["eps"]))
  samples, nfe = sampler(model, params, jax.random.PRNGKey(1))

  assert nfe == int(gold["nfe"])
  want = np.transpose(gold["y"], (0, 2, 3, 1))
  got = np.asarray(samples)
  # f32 divergence compounds over the n_steps-long trajectory; compare
  # with a scale-aware tolerance.
  scale = np.abs(want).mean()
  np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * scale)
