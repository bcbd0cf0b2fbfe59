"""InceptionV3 (pytorch-FID variant) in Flax, NHWC — on-device FID features.

Replaces the reference's host-side feature extraction (TF-Hub Inception
split across GPUs, evaluation.py:125-163, and cleanfid's torchscript
InceptionV3, cleanfid/features.py:13-98) with a jittable forward whose
weights load from an npz produced by tools/convert_inception_weights.py
(from torchvision / pytorch-fid checkpoints; architecture parity:
cleanfid/inception_pytorch.py).

FID-variant details faithfully reproduced:
  * every conv is conv(no bias) + frozen BatchNorm(eps=1e-3) + relu
  * InceptionA/C/E pool branches use avg-pool with
    count_include_pad=False (edge-renormalized averaging)
  * Mixed_7c (InceptionE_2) uses MAX pooling in its pool branch
  * features = global-avg-pool (pool3, 2048-d); logits = fc(features)

Input: [N, 299, 299, 3] float in [0, 255]; normalize_input maps to [-1, 1]
(cleanfid/inception_pytorch.py resize+normalize semantics).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class BasicConv2d(nn.Module):
  """conv(no bias) + frozen BN(eps=1e-3) + relu."""

  features: int
  kernel: Tuple[int, int]
  stride: int = 1
  padding: Any = "VALID"

  @nn.compact
  def __call__(self, x: Array) -> Array:
    x = nn.Conv(self.features, self.kernel,
                strides=(self.stride, self.stride), padding=self.padding,
                use_bias=False, name="conv")(x)
    scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
    bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
    mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
    var = self.param("bn_var", nn.initializers.ones, (self.features,))
    x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
    return nn.relu(x)


def _avg_pool_nocount(x: Array, window: int = 3) -> Array:
  """3x3 stride-1 avg pool with count_include_pad=False."""
  ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
  summed = jax.lax.reduce_window(
      x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
      [(0, 0), (1, 1), (1, 1), (0, 0)])
  counts = jax.lax.reduce_window(
      ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
      [(0, 0), (1, 1), (1, 1), (0, 0)])
  return summed / counts


def _max_pool(x: Array, window: int = 3, stride: int = 2,
              padding: str = "VALID") -> Array:
  return nn.max_pool(x, (window, window), strides=(stride, stride),
                     padding=padding)


class InceptionA(nn.Module):
  pool_features: int

  @nn.compact
  def __call__(self, x):
    b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
    b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
    b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)),
                     name="branch5x5_2")(b5)
    b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
    b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                     name="branch3x3dbl_2")(b3)
    b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                     name="branch3x3dbl_3")(b3)
    bp = _avg_pool_nocount(x)
    bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):

  @nn.compact
  def __call__(self, x):
    b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
    bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
    bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                     name="branch3x3dbl_2")(bd)
    bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
  channels_7x7: int

  @nn.compact
  def __call__(self, x):
    c7 = self.channels_7x7
    p17 = ((0, 0), (3, 3))
    p71 = ((3, 3), (0, 0))
    b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
    b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
    b7 = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
    b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
    bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
    bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
    bd = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
    bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
    bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
    bp = _avg_pool_nocount(x)
    bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):

  @nn.compact
  def __call__(self, x):
    b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
    b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
    b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
    b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                     name="branch7x7x3_2")(b7)
    b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                     name="branch7x7x3_3")(b7)
    b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
  pool_type: str = "avg"  # Mixed_7b: avg (no count pad); Mixed_7c: max

  @nn.compact
  def __call__(self, x):
    b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
    b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
    b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                      name="branch3x3_2a")(b3)
    b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                      name="branch3x3_2b")(b3)
    b3 = jnp.concatenate([b3a, b3b], axis=-1)
    bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
    bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)),
                     name="branch3x3dbl_2")(bd)
    bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                      name="branch3x3dbl_3a")(bd)
    bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                      name="branch3x3dbl_3b")(bd)
    bd = jnp.concatenate([bda, bdb], axis=-1)
    if self.pool_type == "avg":
      bp = _avg_pool_nocount(x)
    else:
      bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)))
    bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
  """Returns (pool3 features [N,2048], class probs [N,1008->1000])."""

  normalize_input: bool = True
  num_classes: int = 1000

  @nn.compact
  def __call__(self, x: Array) -> Tuple[Array, Array]:
    if self.normalize_input:
      x = x / 127.5 - 1.0  # [0,255] -> [-1,1]
    x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
    x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
    x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)),
                    name="Conv2d_2b_3x3")(x)
    x = _max_pool(x)
    x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
    x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
    x = _max_pool(x)
    x = InceptionA(32, name="Mixed_5b")(x)
    x = InceptionA(64, name="Mixed_5c")(x)
    x = InceptionA(64, name="Mixed_5d")(x)
    x = InceptionB(name="Mixed_6a")(x)
    x = InceptionC(128, name="Mixed_6b")(x)
    x = InceptionC(160, name="Mixed_6c")(x)
    x = InceptionC(160, name="Mixed_6d")(x)
    x = InceptionC(192, name="Mixed_6e")(x)
    x = InceptionD(name="Mixed_7a")(x)
    x = InceptionE("avg", name="Mixed_7b")(x)
    x = InceptionE("max", name="Mixed_7c")(x)
    feats = jnp.mean(x, axis=(1, 2))  # global avg pool -> [N, 2048]
    logits = nn.Dense(self.num_classes, name="fc")(feats)
    probs = jax.nn.softmax(logits, axis=-1)
    return feats, probs


def load_params_npz(path: str) -> Dict[str, Any]:
  """Load a flat npz ('Mixed_5b/branch1x1/conv/kernel', ...) into a nested
  Flax params dict (written by tools/convert_inception_weights.py)."""
  flat = np.load(path)
  params: Dict[str, Any] = {}
  for key in flat.files:
    parts = key.split("/")
    node = params
    for p in parts[:-1]:
      node = node.setdefault(p, {})
    node[parts[-1]] = jnp.asarray(flat[key])
  return params
