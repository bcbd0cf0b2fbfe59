"""fp8 activation byte-diet (config.tpu.activation_dtype='float8_e4m3',
ops/quant.py): conv input activations stored as e4m3, cotangents through
an e5m2 round-trip, weights/norms/optimizer state f32.

The knob exists because the train step is HBM-bandwidth-bound at ~95% of
the v5e roofline (benchmarks/ROOFLINE.md) and activations are the
dominant byte term. These tests pin the SEMANTICS on CPU — exact
quantization behavior, nn.Conv interchangeability (param tree and
checkpoints), gradient flow, and bounded 30-step trajectory drift; the
throughput keep/revert verdict lives in ROOFLINE.md's measured record.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.losses import get_optimizer
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.ops.quant import E4M3, E5M2, QConv, fp8_conv
from soft_truncation_tpu.sde import get_sde
from soft_truncation_tpu.train import init_train_state, make_train_step


def _x(key, shape, scale=1.0):
  return jax.random.normal(key, shape) * scale


# ---------------------------------------------------------------------------
# fp8_conv / QConv semantics
# ---------------------------------------------------------------------------


def test_fp8_conv_equals_conv_of_quantized_input():
  """The forward is EXACTLY conv(e4m3(x), w) — quantization happens at the
  input boundary and nowhere else."""
  kx, kw = jax.random.split(jax.random.PRNGKey(0))
  x = _x(kx, (2, 8, 8, 4))
  w = _x(kw, (3, 3, 4, 6)) * 0.1
  y = fp8_conv(x, w, (1, 1), "SAME", jnp.float32)
  dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                      ("NHWC", "HWIO", "NHWC"))
  y_ref = jax.lax.conv_general_dilated(
      x.astype(E4M3).astype(jnp.float32), w, (1, 1), "SAME",
      dimension_numbers=dn, preferred_element_type=jnp.float32)
  np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
  # and within e4m3 rounding (2^-4 relative) of the exact conv
  y_exact = jax.lax.conv_general_dilated(
      x, w, (1, 1), "SAME", dimension_numbers=dn)
  rel = float(jnp.max(jnp.abs(y - y_exact)) / jnp.max(jnp.abs(y_exact)))
  assert rel < 0.1, rel


def test_fp8_conv_gradients_flow_and_are_close():
  kx, kw, kg = jax.random.split(jax.random.PRNGKey(1), 3)
  x = _x(kx, (2, 8, 8, 4))
  w = _x(kw, (3, 3, 4, 6)) * 0.1
  ct = _x(kg, (2, 8, 8, 6))

  def f_q(x, w):
    return jnp.sum(fp8_conv(x, w, (1, 1), "SAME", jnp.float32) * ct)

  def f_ref(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jnp.sum(jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn) * ct)

  dx_q, dw_q = jax.grad(f_q, argnums=(0, 1))(x, w)
  dx_r, dw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
  assert dx_q.dtype == x.dtype and dw_q.dtype == w.dtype
  # e5m2 cotangents (2 mantissa bits, 2^-3 relative) dominate the error
  for q, r in ((dx_q, dx_r), (dw_q, dw_r)):
    rel = float(jnp.max(jnp.abs(q - r)) / jnp.max(jnp.abs(r)))
    assert rel < 0.25, rel
    assert float(jnp.max(jnp.abs(q))) > 0.0


def test_fp8_conv_grad_lowers_under_bfloat16_compute():
  """Regression: with compute_dtype=bfloat16 (the TPU bench config) the
  backward's linear_transpose used to crash at lowering — transposing
  the f32-accumulate+downcast conv feeds an f32 cotangent into a conv
  against the bf16 kernel ('requires arguments to have the same
  dtypes'). CPU f32 tests missed it because the cast chain is a no-op
  there."""
  kx, kw = jax.random.split(jax.random.PRNGKey(3))
  x = _x(kx, (2, 8, 8, 4)).astype(jnp.bfloat16)
  w = (_x(kw, (3, 3, 4, 6)) * 0.1).astype(jnp.bfloat16)

  def f(x, w):
    return jnp.sum(
        fp8_conv(x, w, (1, 1), "SAME", jnp.bfloat16).astype(jnp.float32))

  dx, dw = jax.jit(jax.grad(f, argnums=(0, 1)))(x, w)
  assert dx.dtype == jnp.bfloat16 and dw.dtype == jnp.bfloat16
  assert float(jnp.max(jnp.abs(dx.astype(jnp.float32)))) > 0.0
  assert float(jnp.max(jnp.abs(dw.astype(jnp.float32)))) > 0.0


@pytest.mark.parametrize("stride,padding", [
    (1, "SAME"),
    (2, ((0, 1), (0, 1))),  # the Downsample conv's exact form
])
def test_qconv_interchangeable_with_nn_conv(stride, padding):
  """Same param tree + output within e4m3 rounding of nn.Conv, for the
  plain and the strided/custom-padded (Downsample) configurations."""
  kx, kp = jax.random.split(jax.random.PRNGKey(2))
  x = _x(kx, (2, 8, 8, 4))
  kwargs = dict(kernel_init=nn.initializers.lecun_normal(),
                bias_init=nn.initializers.zeros)
  ref = nn.Conv(6, (3, 3), strides=(stride, stride), padding=padding,
                **kwargs)
  q = QConv(6, (3, 3), strides=(stride, stride), padding=padding, **kwargs)
  v = ref.init(kp, x)
  vq = q.init(kp, x)
  assert (jax.tree.map(lambda a: (a.shape, str(a.dtype)), v)
          == jax.tree.map(lambda a: (a.shape, str(a.dtype)), vq))
  y_ref = ref.apply(v, x)
  y_q = q.apply(v, x)  # nn.Conv params drive QConv directly
  assert y_q.shape == y_ref.shape
  rel = float(jnp.max(jnp.abs(y_q - y_ref)) / jnp.max(jnp.abs(y_ref)))
  assert rel < 0.1, rel


def test_e4m3_flushes_subnormals_the_way_the_docstring_says():
  """Values below e4m3's subnormal floor quantize to zero — documented
  hazard for anything O(2^-9) fed to a quantized conv."""
  tiny = jnp.float32(1e-4)
  assert float(tiny.astype(E4M3)) == 0.0
  one = jnp.float32(1.0)
  assert float(one.astype(E4M3)) == 1.0
  assert float(jnp.float32(300.0).astype(E4M3)) == 288.0  # 3-bit mantissa
  assert float(jnp.float32(1e-3).astype(E5M2)) != 0.0  # e5m2 keeps range


# ---------------------------------------------------------------------------
# Model-level: param-tree compat + training drift
# ---------------------------------------------------------------------------


def _tiny_config(**tpu_overrides):
  config = default_config("cifar10")
  override(config, {
      "training": dict(sde="vpsde", continuous=True, reduce_mean=True,
                       st=True, k=1.0, truncation_time=1e-5, batch_size=8),
      "optim": dict(num_micro_batch=1, warmup=10),
      "data": dict(image_size=8, centered=True),
      "model": dict(
          name="ncsnpp", scale_by_sigma=False, ema_rate=0.9999,
          normalization="GroupNorm", nonlinearity="swish", nf=8,
          ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,),
          resamp_with_conv=True, conditional=True, fir=False,
          fir_kernel=[1, 3, 3, 1], skip_rescale=True,
          resblock_type="biggan", progressive="none",
          progressive_input="none", progressive_combine="sum",
          init_scale=0.0, embedding_type="fourier", fourier_scale=16),
      "tpu": tpu_overrides,
  })
  return config


def test_param_tree_identical_so_checkpoints_interchange():
  """activation_dtype must not change the checkpoint format: abstract
  init trees (names, shapes, dtypes) are identical."""
  x = jnp.zeros((2, 8, 8, 3))
  t = jnp.full((2,), 0.5)
  trees = []
  for tpu in ({}, dict(activation_dtype="float8_e4m3")):
    model = create_model(_tiny_config(**tpu))
    v = jax.eval_shape(
        lambda m=model: m.init(jax.random.PRNGKey(0), x, t, train=False))
    trees.append(jax.tree.map(lambda a: (a.shape, str(a.dtype)), v))
  assert trees[0] == trees[1]


def _train(config, n_steps=30):
  sde = get_sde(config)
  model = create_model(config)
  tx = get_optimizer(config)
  state = init_train_state(jax.random.PRNGKey(0), config, model, tx)
  step = jax.jit(make_train_step(config, sde, model, tx))
  batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3)) * 2 - 1
  key = jax.random.PRNGKey(2)
  losses = []
  for _ in range(n_steps):
    key, k = jax.random.split(key)
    state, loss = step(state, batch, k)
    losses.append(np.asarray(loss))
  return state, np.asarray(losses)


def test_fp8_training_tracks_f32_trajectory():
  """30 steps fp8 vs f32 (à la tests/test_byte_diet.py): losses stay
  close in aggregate, both trajectories optimize, params drift but stay
  in the same basin — quantization noise, not divergence."""
  state32, losses32 = _train(_tiny_config())
  state8, losses8 = _train(_tiny_config(activation_dtype="float8_e4m3"))

  assert np.all(np.isfinite(losses8))
  # per-step losses track within a few percent of the f32 loss scale
  # (the ST loss is importance-sampled and too noisy over 30 steps for a
  # monotone-decrease check — tracking the f32 arm step for step is the
  # meaningful bound)
  rel = np.max(np.abs(losses8 - losses32) / np.abs(losses32))
  assert rel < 0.05, rel

  # parameter drift: nonzero (fp8 really engaged) and at the scale of
  # training movement, not beyond it. Adam normalizes gradient magnitude,
  # so ANY gradient perturbation moves params at the lr scale — param
  # trajectories separate at O(movement) even for benign noise (measured:
  # drift ~= 0.98x movement here); the loss-space tracking above is the
  # quality bound, this is the not-diverging bound.
  model = create_model(_tiny_config())
  v0 = model.init({"params": jax.random.PRNGKey(0)},
                  jnp.zeros((1, 8, 8, 3)), jnp.full((1,), 0.5), train=False)
  moved = max(jax.tree.leaves(jax.tree.map(
      lambda a, b: float(jnp.max(jnp.abs(a - b))),
      state32.params, v0["params"])))
  drift = max(jax.tree.leaves(jax.tree.map(
      lambda a, b: float(jnp.max(jnp.abs(a - b))),
      state32.params, state8.params)))
  assert drift > 0.0
  assert drift < 2.0 * moved, (drift, moved)
