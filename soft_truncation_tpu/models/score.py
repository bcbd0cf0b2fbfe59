"""Score-function wrapping: label transforms + output calibration.

Parity target: reference models/utils.py:97-190. The raw network output is
converted into a calibrated score s(x, t) ≈ ∇_x log p_t(x):

  VP / subVP, continuous:
    labels = t*999, or — with unbounded parametrization — the normalized
    antiderivative of the log-variance scaled to [0, 999]
    (models/utils.py:149-155); if training.ddpm_score, the model predicts
    scaled noise and score = -out / std(t) (models/utils.py:169-170).
  VP discrete: labels = t*(N-1), std from the DDPM alphas grid.
  VE / RVE, continuous: labels = sigma(t); the model embeds log sigma.
  VE discrete: labels = round((T-t)*(N-1)).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..sde.core import (SDE, VESDE, VPSDE, ReciprocalVESDE, SubVPSDE,
                        batch_mul)

Array = jax.Array


# param-leaf paths whose modules compute in f32 regardless of the model's
# compute dtype: GroupNorms (f32 statistics), the Fourier time embedding,
# and the (vestigial) LogSNR PosDense; everything else (convs/NIN/Dense
# incl. temb projections) runs at model.dtype and converts its f32 params
# to bf16 on every call. This list is a NAMING CONVENTION — the real
# invariant (pre-casting changes no bit of any registered family's eval
# forward) is pinned by test_cast_params_for_eval_bit_identical; any new
# f32-computing module must either match a marker here or fail that test.
_F32_PARAM_MARKERS = ("norm", "fourier", "logsnr", "pos_dense")


def cast_params_for_eval(model, params):
  """Pre-cast bf16-compute params ONCE for inference loops.

  Inside a sampler scan every model eval re-converts the f32 params to
  bf16 (248 MB of f32 reads per eval at 62M params). Casting the non-norm,
  non-fourier leaves up front is numerically IDENTICAL (the convs see the
  same bf16 values) and halves the param-read traffic of every eval in
  the scan. No-op for f32-compute models."""
  dtype = getattr(model, "dtype", jnp.float32)
  if dtype == jnp.float32:
    return params

  def cast(path, p):
    keys = [getattr(k, "key", "") for k in path]
    if any(m in str(k).lower() for k in keys for m in _F32_PARAM_MARKERS):
      return p
    return p.astype(dtype) if p.dtype == jnp.float32 else p

  return jax.tree_util.tree_map_with_path(cast, params)


def get_model_fn(model, params, train: bool = False,
                 rngs: Optional[dict] = None) -> Callable:
  """Raw network apply with train/eval switch (models/utils.py:97-126)."""
  if not train:
    params = cast_params_for_eval(model, params)

  def model_fn(x: Array, labels: Array) -> Array:
    if train:
      return model.apply({"params": params}, x, labels, train=True,
                         rngs=rngs or {})
    return model.apply({"params": params}, x, labels, train=False)

  return model_fn


def get_score_fn(config, sde: SDE, model, params, train: bool = False,
                 continuous: bool = False,
                 rngs: Optional[dict] = None) -> Callable[[Array, Array], Array]:
  """Build s(x, t) from the raw network (models/utils.py:128-190)."""
  model_fn = get_model_fn(model, params, train=train, rngs=rngs)

  if isinstance(sde, (VPSDE, SubVPSDE)):
    unbounded = config.training.get("unbounded_parametrization", False)
    stab = config.training.get("stabilizing_constant", 1e-3)
    ddpm_score = config.training.get("ddpm_score", True)

    def score_fn(x: Array, t: Array) -> Array:
      if continuous or isinstance(sde, SubVPSDE):
        if unbounded:
          lo = sde.antiderivative(jnp.asarray(1e-5), stab)
          hi = sde.antiderivative(jnp.asarray(sde.T), stab)
          labels = (sde.antiderivative(t, stab) - lo) / (hi - lo) * 999.0
        else:
          labels = t * 999.0
        std = sde.marginal_std(t)
        score = model_fn(x, labels)
      else:
        labels = t * (sde.N - 1)
        score = model_fn(x, labels)
        std = sde.sqrt_1m_alphas_cumprod()[labels.astype(jnp.int32)]

      if ddpm_score:
        score = -batch_mul(1.0 / std, score)
      return score

  elif isinstance(sde, (VESDE, ReciprocalVESDE)):

    def score_fn(x: Array, t: Array) -> Array:
      if continuous:
        labels = sde.marginal_prob(jnp.zeros_like(t), t)[1]
      else:
        labels = jnp.round((sde.T - t) * (sde.N - 1)).astype(jnp.int32)
      return model_fn(x, labels)

  else:
    raise NotImplementedError(
        f"SDE class {type(sde).__name__} not yet supported.")

  return score_fn
