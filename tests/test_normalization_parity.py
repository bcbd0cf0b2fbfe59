"""Direct numeric parity for the normalization zoo vs the reference
torch modules (reference models/normalization.py:43-215).

The model-forward parity tests already exercise InstanceNorm++ and the
conditional InstanceNorm++ through NCSNv1/v2 with ported weights; this
file pins EVERY zoo variant in isolation — including the ones no
released config reaches (VarianceNorm, the conditional
Variance/None/Instance norms, and the reference-dead
ConditionalBatchNorm2d) — weights copied torch→Flax, same input,
NCHW↔NHWC transposed, 1e-5 tolerance.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="reference repo not mounted")

if os.path.isdir("/root/reference"):
  sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from soft_truncation_tpu.models import normalization as zoo  # noqa: E402

B, C, H, W, NCLS = 3, 6, 5, 4, 7
TOL = dict(rtol=1e-5, atol=1e-5)


def _torch():
  import torch
  from models import normalization as ref
  torch.manual_seed(0)
  return torch, ref


def _x_y():
  rng = np.random.default_rng(0)
  x = rng.standard_normal((B, C, H, W)).astype(np.float32)  # NCHW
  y = rng.integers(0, NCLS, (B,))
  return x, y


def _run_ref(mod, x, y=None):
  import torch
  with torch.no_grad():
    args = (torch.from_numpy(x),) if y is None else (
        torch.from_numpy(x), torch.from_numpy(y))
    return mod(*args).numpy()


def _nhwc(x):
  return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _to_nchw(out):
  return np.transpose(np.asarray(out), (0, 3, 1, 2))


def test_instance_norm_plain():
  torch, ref = _torch()
  x, _ = _x_y()
  want = _run_ref(torch.nn.InstanceNorm2d(C, affine=False), x)
  got = _to_nchw(zoo.instance_norm_2d(_nhwc(x)))
  np.testing.assert_allclose(got, want, **TOL)


def test_none_norm():
  x, _ = _x_y()
  out = zoo.NoneNorm2d().apply({}, _nhwc(x))
  np.testing.assert_allclose(_to_nchw(out), x, rtol=0)


def test_variance_norm():
  torch, ref = _torch()
  x, _ = _x_y()
  m = ref.VarianceNorm2d(C)
  want = _run_ref(m, x)
  params = {"params": {"alpha": jnp.asarray(m.alpha.detach().numpy())}}
  got = _to_nchw(zoo.VarianceNorm2d().apply(params, _nhwc(x)))
  np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("bias", [True, False])
def test_instance_norm_plus(bias):
  torch, ref = _torch()
  x, _ = _x_y()
  m = ref.InstanceNorm2dPlus(C, bias=bias)
  want = _run_ref(m, x)
  p = {"alpha": jnp.asarray(m.alpha.detach().numpy()),
       "gamma": jnp.asarray(m.gamma.detach().numpy())}
  if bias:
    p["beta"] = jnp.asarray(m.beta.detach().numpy())
  got = _to_nchw(zoo.InstanceNorm2dPlus(bias=bias).apply(
      {"params": p}, _nhwc(x)))
  np.testing.assert_allclose(got, want, **TOL)


def _embed_params(m):
  return {"embed": {"embedding": jnp.asarray(m.embed.weight.detach().numpy())}}


@pytest.mark.parametrize("bias", [True, False])
def test_conditional_instance_norm_plus(bias):
  torch, ref = _torch()
  x, y = _x_y()
  m = ref.ConditionalInstanceNorm2dPlus(C, NCLS, bias=bias)
  want = _run_ref(m, x, y)
  got = _to_nchw(zoo.ConditionalInstanceNorm2dPlus(
      num_classes=NCLS, bias=bias).apply(
          {"params": _embed_params(m)}, _nhwc(x), jnp.asarray(y)))
  np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("bias", [True, False])
def test_conditional_instance_norm(bias):
  torch, ref = _torch()
  x, y = _x_y()
  m = ref.ConditionalInstanceNorm2d(C, NCLS, bias=bias)
  want = _run_ref(m, x, y)
  got = _to_nchw(zoo.ConditionalInstanceNorm2d(
      num_classes=NCLS, bias=bias).apply(
          {"params": _embed_params(m)}, _nhwc(x), jnp.asarray(y)))
  np.testing.assert_allclose(got, want, **TOL)


def test_conditional_variance_norm():
  torch, ref = _torch()
  x, y = _x_y()
  m = ref.ConditionalVarianceNorm2d(C, NCLS)
  want = _run_ref(m, x, y)
  got = _to_nchw(zoo.ConditionalVarianceNorm2d(num_classes=NCLS).apply(
      {"params": _embed_params(m)}, _nhwc(x), jnp.asarray(y)))
  np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("bias", [True, False])
def test_conditional_none_norm(bias):
  torch, ref = _torch()
  x, y = _x_y()
  m = ref.ConditionalNoneNorm2d(C, NCLS, bias=bias)
  want = _run_ref(m, x, y)
  got = _to_nchw(zoo.ConditionalNoneNorm2d(
      num_classes=NCLS, bias=bias).apply(
          {"params": _embed_params(m)}, _nhwc(x), jnp.asarray(y)))
  np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("bias", [True, False])
def test_conditional_batch_norm_train_and_eval(bias):
  """Reference-dead variant (models/normalization.py:43-66, unreachable
  via get_normalization) — train mode normalizes by batch stats, eval
  by the (fresh) running stats."""
  torch, ref = _torch()
  x, y = _x_y()
  m = ref.ConditionalBatchNorm2d(C, NCLS, bias=bias)

  mod = zoo.ConditionalBatchNorm2d(num_classes=NCLS, bias=bias)
  variables = mod.init(jax.random.PRNGKey(0), _nhwc(x), jnp.asarray(y))
  variables = {
      "params": _embed_params(m),
      "batch_stats": variables["batch_stats"],
  }

  m.train()
  want = _run_ref(m, x, y)
  got, _ = mod.apply(variables, _nhwc(x), jnp.asarray(y), train=True,
                     mutable=["batch_stats"])
  np.testing.assert_allclose(_to_nchw(got), want, rtol=1e-4, atol=1e-4)

  m2 = ref.ConditionalBatchNorm2d(C, NCLS, bias=bias)
  m2.embed.weight.data = m.embed.weight.data
  m2.eval()  # fresh running stats: mean 0, var 1
  want_eval = _run_ref(m2, x, y)
  got_eval = mod.apply(variables, _nhwc(x), jnp.asarray(y), train=False)
  np.testing.assert_allclose(_to_nchw(got_eval), want_eval, **TOL)


@pytest.mark.parametrize("bias", [True, False])
def test_conditional_batch_norm_running_stats_evolution(bias):
  """Torch accumulates the UNBIASED batch variance into running_var while
  normalizing by the biased one (torch _BatchNorm.forward); eval outputs
  after a few train steps expose any mismatch (Flax's stock nn.BatchNorm
  accumulates the biased variance and misses this by ~2e-3)."""
  torch, ref = _torch()
  m = ref.ConditionalBatchNorm2d(C, NCLS, bias=bias)

  mod = zoo.ConditionalBatchNorm2d(num_classes=NCLS, bias=bias)
  x0, y0 = _x_y()
  variables = mod.init(jax.random.PRNGKey(0), _nhwc(x0), jnp.asarray(y0))
  variables = {"params": _embed_params(m),
               "batch_stats": variables["batch_stats"]}

  rng = np.random.default_rng(7)
  m.train()
  for _ in range(3):  # evolve running stats through several batches
    x = rng.standard_normal((B, C, H, W)).astype(np.float32) * 1.7 + 0.3
    y = rng.integers(0, NCLS, (B,))
    want = _run_ref(m, x, y)
    got, updates = mod.apply(variables, _nhwc(x), jnp.asarray(y),
                             train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": updates["batch_stats"]}
    np.testing.assert_allclose(_to_nchw(got), want, rtol=1e-4, atol=1e-4)

  np.testing.assert_allclose(
      np.asarray(variables["batch_stats"]["bn"]["mean"]),
      m.bn.running_mean.numpy(), **TOL)
  np.testing.assert_allclose(
      np.asarray(variables["batch_stats"]["bn"]["var"]),
      m.bn.running_var.numpy(), **TOL)

  m.eval()
  x, y = _x_y()
  want_eval = _run_ref(m, x, y)
  got_eval = mod.apply(variables, _nhwc(x), jnp.asarray(y), train=False)
  np.testing.assert_allclose(_to_nchw(got_eval), want_eval, **TOL)
