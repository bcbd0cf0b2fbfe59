"""Emit a RANDOM-INIT InceptionV3 weights npz in the exact flat layout
tools/convert_inception_weights.py writes (consumed by
soft_truncation_tpu.eval.inception_v3.load_params_npz).

Purpose: the zero-egress environment cannot download the real
pytorch-FID / NVIDIA torchscript weights, but feature-extraction
THROUGHPUT is weight-independent, and FID computed through a fixed
random deep feature map is still a valid *discrimination* metric
(random-feature FID separates distributions; it is just not comparable
to published Inception-FID numbers). This gives the production FID
pipeline a real 299² on-device extractor to drive at 50k scale
(reference featurizes every sample: evaluation.py:125-163) and the
metric curve a consistent featurizer.

He gain: flax's default conv init is LeCun-normal (fan_in variance 1),
which loses a factor ~2 of activation variance at every conv+ReLU;
through InceptionV3's ~48-deep conv stack the pool_3 features collapse
to ~2e-4 std and FID sits at numerical-noise level (measured: the
round-4 metric curve logged FID≈1.6e-4 and IS=1.000 at EVERY training
snapshot). Scaling conv kernels by sqrt(2) (He init) restores order-1
features; probe on this net (tools/probe_random_fid.py, n=64):
  gain 1.0    pool3 std 1.9e-4  fid(val,val') 7.8e-7  fid(val,noise) 1.4e-4
  gain √2     pool3 std 0.32    fid(val,val') 3.06    fid(val,noise) 483
  gain 1.6    pool3 std 10.1    fid(val,val') 3227    fid(val,noise) 5.2e5
√2 is the default; pass gain to override (1.0 reproduces the old npz).

Usage:
  python tools/make_random_inception_npz.py <out.npz> [seed] [gain]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def he_rescale(flat: dict, gain: float) -> dict:
  """Scale 4-D conv kernels by `gain`, leave bn scales/offsets alone."""
  return {k: (v * gain if v.ndim == 4 else v) for k, v in flat.items()}


def main():
  out = sys.argv[1] if len(sys.argv) > 1 else "assets/inception_v3_weights.npz"
  seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
  gain = float(sys.argv[3]) if len(sys.argv) > 3 else float(np.sqrt(2.0))

  import jax
  jax.config.update("jax_platforms", "cpu")  # host-only; never touch axon
  import jax.numpy as jnp
  from flax.traverse_util import flatten_dict

  from soft_truncation_tpu.eval.inception_v3 import InceptionV3

  model = InceptionV3()
  params = model.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, 299, 299, 3)))["params"]
  flat = {"/".join(k): np.asarray(v)
          for k, v in flatten_dict(params).items()}
  # BatchNorm running stats are parameters in this port (inference-only):
  # give the random net sane activation scales (identity norm).
  flat = he_rescale(flat, gain)
  os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
  np.savez_compressed(out, **flat)
  print(f"wrote {out}: {len(flat)} arrays, "
        f"{sum(v.size for v in flat.values()):,} params (RANDOM INIT, "
        f"conv gain {gain:.4f} — throughput/discrimination use only)")


if __name__ == "__main__":
  main()
