"""Model zoo smoke tests: shapes, jit, gradients, all structural variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.configs.base import default_config, override


def tiny_ncsnpp_config(**model_overrides):
  config = default_config("cifar10")
  model = dict(
      name="ncsnpp", scale_by_sigma=False, ema_rate=0.9999,
      normalization="GroupNorm", nonlinearity="swish", nf=16,
      ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
      resamp_with_conv=True, conditional=True, fir=False,
      fir_kernel=[1, 3, 3, 1], skip_rescale=True, resblock_type="biggan",
      progressive="none", progressive_input="none",
      progressive_combine="sum", attention_type="ddpm", init_scale=0.0,
      embedding_type="fourier", fourier_scale=16, conv_size=3)
  model.update(model_overrides)
  override(config, {"model": model,
                    "data": dict(image_size=16, centered=True)})
  return config


def _init_and_forward(config, t_kind="sigma"):
  model = create_model(config)
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
  if t_kind == "sigma":
    t = jnp.asarray([1.0, 10.0])
  else:
    t = jnp.asarray([0.0, 500.0])
  variables = model.init({"params": jax.random.PRNGKey(1)}, x, t, train=False)
  out = model.apply(variables, x, t, train=False)
  return model, variables, out


@pytest.mark.parametrize("kwargs,t_kind", [
    (dict(), "sigma"),                                     # DDPM++-like
    (dict(fir=True, progressive_input="residual",
          scale_by_sigma=True), "sigma"),                  # UNCSN++-like
    (dict(embedding_type="positional"), "label"),          # positional temb
    (dict(progressive="output_skip", progressive_input="input_skip",
          progressive_combine="cat", fir=True), "sigma"),  # NCSN++ deep-style
    (dict(resblock_type="ddpm"), "sigma"),                 # DDPM resblocks
    (dict(fourier_feature=True), "sigma"),                 # UNCSN++ ff input
    (dict(lsgm=True, embedding_dim=24,
          embedding_type="positional"), "label"),          # deepest/lsgm
    (dict(attention=False), "sigma"),
], ids=["base", "uncsnpp", "positional", "progressive", "ddpmblock",
        "fourier_feature", "lsgm", "noattn"])
def test_ncsnpp_variants(kwargs, t_kind):
  config = tiny_ncsnpp_config(**kwargs)
  _, variables, out = _init_and_forward(config, t_kind)
  assert out.shape == (2, 16, 16, 3)
  assert jnp.all(jnp.isfinite(out))


def test_ncsnpp_jit_and_grad():
  config = tiny_ncsnpp_config()
  model, variables, _ = _init_and_forward(config)
  x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
  t = jnp.asarray([1.0, 5.0])

  @jax.jit
  def loss(params):
    out = model.apply({"params": params}, x, t, train=True,
                      rngs={"dropout": jax.random.PRNGKey(3)})
    return jnp.mean(out ** 2)

  g = jax.grad(loss)(variables["params"])
  flat = jax.tree.leaves(g)
  assert all(jnp.all(jnp.isfinite(l)) for l in flat)
  # the frozen Fourier W must receive exactly zero gradient
  g_w = g["fourier_emb"]["W"]
  assert float(jnp.abs(g_w).max()) == 0.0


def test_ddpm_model():
  config = default_config("cifar10")
  override(config, {
      "model": dict(name="ddpm", nf=32, ch_mult=(1, 2), num_res_blocks=1,
                    attn_resolutions=(8,), resamp_with_conv=True,
                    conditional=True, nonlinearity="swish",
                    scale_by_sigma=False, ema_rate=0.9999,
                    normalization="GroupNorm"),
      "data": dict(image_size=16, centered=True)})
  model = create_model(config)
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
  labels = jnp.asarray([3, 999])
  variables = model.init({"params": jax.random.PRNGKey(1)}, x, labels)
  out = model.apply(variables, x, labels)
  assert out.shape == x.shape
  assert jnp.all(jnp.isfinite(out))


def test_ncsnv2_model():
  config = default_config("cifar10")
  override(config, {
      "model": dict(name="ncsnv2_64", nf=16, nonlinearity="elu",
                    normalization="InstanceNorm++", ema_rate=0.999,
                    scale_by_sigma=True),
      "data": dict(image_size=16, centered=False)})
  model = create_model(config)
  x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
  labels = jnp.asarray([0, 10])
  variables = model.init({"params": jax.random.PRNGKey(1)}, x, labels)
  out = model.apply(variables, x, labels)
  assert out.shape == x.shape
  assert jnp.all(jnp.isfinite(out))


def test_ncsn_conditional_model():
  from soft_truncation_tpu.models.ncsnv2 import NCSN
  model = NCSN(nf=16, image_size=16, num_channels=3, num_scales=10)
  x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
  labels = jnp.asarray([0, 9])
  variables = model.init({"params": jax.random.PRNGKey(1)}, x, labels)
  out = model.apply(variables, x, labels)
  assert out.shape == x.shape


def test_logsnr_monotone():
  from soft_truncation_tpu.models.logsnr import LogSNR
  model = LogSNR(mid_dim=16)
  t = jnp.linspace(0.0, 1.0, 64)
  variables = model.init(jax.random.PRNGKey(0), t)
  g = model.apply(variables, t)
  assert g.shape == (64,)
  assert jnp.all(jnp.diff(g) >= -1e-5)  # monotone nondecreasing


@pytest.mark.parametrize("kwargs", [
    dict(), dict(embedding_type="positional"),
    dict(fir=True, progressive_input="residual", scale_by_sigma=True),
], ids=["fourier", "positional", "uncsnpp"])
def test_cast_params_for_eval_bit_identical(kwargs):
  """cast_params_for_eval's f32-preservation list is a naming convention;
  THIS is the invariant it stands in for: pre-casting the params must not
  change a single bit of the eval forward (the bf16 convs see the same
  bf16 values either way). Any future f32-computing module whose param
  path misses the marker list fails here."""
  from soft_truncation_tpu.models.score import cast_params_for_eval

  config = tiny_ncsnpp_config(**kwargs)
  config.tpu.compute_dtype = "bfloat16"
  model = create_model(config)
  assert model.dtype == jnp.bfloat16
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
  t = jnp.asarray([1.0, 10.0])
  params = model.init({"params": jax.random.PRNGKey(1)}, x, t,
                      train=False)["params"]

  cast = cast_params_for_eval(model, params)
  leaves = jax.tree_util.tree_flatten_with_path(cast)[0]
  assert any(p.dtype == jnp.bfloat16 for _, p in leaves)  # not vacuous
  # norm/fourier leaves must stay f32 (their modules compute in f32)
  for path, p in leaves:
    if any(m in jax.tree_util.keystr(path).lower()
           for m in ("norm", "fourier")):
      assert p.dtype == jnp.float32, jax.tree_util.keystr(path)

  out0 = np.asarray(model.apply({"params": params}, x, t, train=False))
  out1 = np.asarray(model.apply({"params": cast}, x, t, train=False))
  np.testing.assert_array_equal(out0, out1)


@pytest.mark.parametrize("policy", ["full", "conv_outputs"])
def test_ncsnpp_remat_policies_match_nonremat(policy):
  """tpu.remat + either remat_policy must change neither the forward nor
  the gradients (activation checkpointing is a scheduling choice, not a
  numerics choice)."""
  base = tiny_ncsnpp_config()
  model0 = create_model(base)

  config = tiny_ncsnpp_config()
  config.tpu.remat = True
  config.tpu.remat_policy = policy
  model1 = create_model(config)
  assert model1.remat and model1.remat_policy == policy

  x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
  t = jnp.asarray([1.0, 10.0])
  params = model0.init({"params": jax.random.PRNGKey(1)}, x, t,
                       train=False)["params"]

  def loss(m, p):
    return jnp.sum(m.apply({"params": p}, x, t, train=False) ** 2)

  np.testing.assert_allclose(
      np.asarray(loss(model0, params)), np.asarray(loss(model1, params)),
      rtol=1e-6)
  g0 = jax.grad(lambda p: loss(model0, p))(params)
  g1 = jax.grad(lambda p: loss(model1, p))(params)
  for (k0, a), (k1, b) in zip(
      jax.tree_util.tree_flatten_with_path(g0)[0],
      jax.tree_util.tree_flatten_with_path(g1)[0]):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6,
                               err_msg=jax.tree_util.keystr(k0))
