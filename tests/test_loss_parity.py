"""Loss-value parity vs the reference torch loss: with reference-ported
weights and pinned (t, Z, z) draws, our continuous score-matching loss
must reproduce the reference's per-example losses numerically (goldens
from tools/make_loss_goldens.py, reference losses.py:61-168).

Covers IS weighting, likelihood g^2 weighting, default sigma^2 weighting,
and the reconstruction loss with both decoders (lossless discretized
Gaussian, Gaussian entropy form), over VP and VE score wrappings.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.losses import get_sde_loss_fn
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.sde import get_sde
from soft_truncation_tpu.utils.torch_port import port_ncsnpp_state_dict

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")

DDPMPP = dict(resblock_type="ddpm", embedding_type="positional")

CASES = {
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
    "ve_is": (dict(fir=True, scale_by_sigma=True),
              dict(sde="vesde", importance_sampling=True), {}),
    # RVE: the UNCSN++ flagship SDE; closes the last score-wrapping path
    "rve_is": (dict(fir=True, scale_by_sigma=True),
               dict(sde="reciprocal_vesde", importance_sampling=True), {}),
}


def make_config(model_ov, train_ov, data_ov):
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
  training = dict(continuous=True, truncation_time=1e-5,
                  stabilizing_constant=1e-3, ddpm_score=False,
                  unbounded_parametrization=False, eta=1e-4,
                  importance_sampling=False, likelihood_weighting=False,
                  reconstruction_loss=False, reduce_mean=True)
  training.update(train_ov)
  data = dict(image_size=16, centered=True)
  data.update(data_ov)
  override(config, {"model": model, "training": training, "data": data})
  return config


@pytest.mark.parametrize("name", list(CASES))
def test_loss_parity(name, monkeypatch):
  gold = np.load(os.path.join(GOLD_DIR, f"loss_golden_{name}.npz"))
  model_ov, train_ov, data_ov = CASES[name]
  config = make_config(model_ov, train_ov, data_ov)

  sde = get_sde(config)
  model = create_model(config)

  batch = jnp.asarray(np.transpose(gold["batch"], (0, 2, 3, 1)))  # NHWC
  t_gold = jnp.asarray(gold["t"])
  Z_gold = jnp.asarray(gold["Z"])
  zs = [jnp.asarray(np.transpose(gold[k], (0, 2, 3, 1)))
        for k in ("z0", "z1")]

  monkeypatch.setattr(
      type(sde), "sample_diffusion_time",
      lambda self, key, b, t_min, importance_sampling: (t_gold, Z_gold))
  z_iter = iter(zs)
  orig_normal = jax.random.normal
  monkeypatch.setattr(jax.random, "normal",
                      lambda key, shape=(), *a, **k: next(z_iter)
                      if shape == batch.shape
                      else orig_normal(key, shape, *a, **k))

  dummy_t = jnp.full((batch.shape[0],), 1.0)
  variables = model.init({"params": jax.random.PRNGKey(0)}, batch, dummy_t,
                         train=False)
  sd = {k[4:]: gold[k] for k in gold.files if k.startswith("sd::")}
  ported = port_ncsnpp_state_dict(sd, config)
  init_paths = {jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
  ported_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(ported)[0]}
  assert init_paths == ported_paths
  params = jax.tree.map(jnp.asarray, ported)

  loss_fn = get_sde_loss_fn(config, sde, train=False)
  losses = loss_fn(params, model, batch, jax.random.PRNGKey(1),
                   float(gold["t_min"]),
                   config.training.importance_sampling)

  np.testing.assert_allclose(np.asarray(losses), gold["losses"],
                             rtol=2e-3, atol=1e-4)


# Mixed IS+DDPM step (reference losses.py:295-320, step_fn_mixed): golden
# pins the full num_micro=2 step through make_train_step — the micro-batch
# slice layout (per-micro [IS-half | DDPM-half]), the ddpm_weight combine,
# and the balanced stop-gradient ratio rescale computed per micro-batch.
MIXED_CASES = ["vp_mixed", "vp_mixed_balanced"]


@pytest.mark.parametrize("name", MIXED_CASES)
def test_mixed_step_parity(name, monkeypatch):
  from soft_truncation_tpu.losses import get_optimizer
  from soft_truncation_tpu.train import init_train_state, make_train_step

  gold = np.load(os.path.join(GOLD_DIR, f"mixed_golden_{name}.npz"))
  config = make_config(
      DDPMPP,
      dict(sde="vpsde", ddpm_score=True,
           importance_sampling=bool(gold["cfg_is"])), {})
  override(config, {"training": dict(st=False, mixed=True,
                                     ddpm_weight=float(gold["ddpm_weight"]),
                                     balanced=bool(gold["balanced"])),
                    "model": dict(dropout=0.0),
                    "optim": dict(num_micro_batch=int(gold["num_micro"]))})

  sde = get_sde(config)
  model = create_model(config)
  tx = get_optimizer(config)
  state = init_train_state(jax.random.PRNGKey(0), config, model, tx,
                           input_shape=(2, 16, 16, 3))

  batch = jnp.asarray(np.transpose(gold["batch"], (0, 2, 3, 1)))  # NHWC
  sd = {k[4:]: gold[k] for k in gold.files if k.startswith("sd::")}
  params = jax.tree.map(jnp.asarray,
                        port_ncsnpp_state_dict(sd, config))
  state = state.replace(params=params)

  # pinned draws, reference call order (is0, dd0, is1, dd1)
  tz = [(jnp.asarray(gold[f"t{i}"]), jnp.asarray(gold[f"Z{i}"]))
        for i in range(4)]
  zs = [jnp.asarray(np.transpose(gold[f"z{i}"], (0, 2, 3, 1)))
        for i in range(4)]
  tz_iter, z_iter = iter(tz), iter(zs)
  monkeypatch.setattr(
      type(sde), "sample_diffusion_time",
      lambda self, key, b, t_min, importance_sampling: next(tz_iter))
  orig_normal = jax.random.normal
  monkeypatch.setattr(jax.random, "normal",
                      lambda key, shape=(), *a, **k: next(z_iter)
                      if shape == zs[0].shape
                      else orig_normal(key, shape, *a, **k))
  # run scan as a Python loop so the pinned iterators advance per
  # micro-batch (lax.scan traces its body once)
  def py_scan(f, init, xs, **kw):
    n = jax.tree.leaves(xs)[0].shape[0]
    carry, ys = init, []
    for i in range(n):
      carry, y = f(carry, jax.tree.map(lambda a: a[i], xs))
      ys.append(y)
    return carry, jnp.stack(ys)
  monkeypatch.setattr(jax.lax, "scan", py_scan)

  train_step = make_train_step(config, sde, model, tx)
  new_state, losses = train_step(state, batch, jax.random.PRNGKey(1))

  assert losses.shape == gold["losses"].shape  # layout: [micro0 | micro1]
  np.testing.assert_allclose(np.asarray(losses), gold["losses"],
                             rtol=2e-3, atol=1e-4)
  assert int(new_state.step) == 1
