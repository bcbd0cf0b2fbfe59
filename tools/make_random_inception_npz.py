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

Usage:
  python tools/make_random_inception_npz.py <out.npz> [seed]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  out = sys.argv[1] if len(sys.argv) > 1 else "assets/inception_v3_weights.npz"
  seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0

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
  os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
  np.savez_compressed(out, **flat)
  print(f"wrote {out}: {len(flat)} arrays, "
        f"{sum(v.size for v in flat.values()):,} params (RANDOM INIT — "
        "throughput/pipeline use only)")


if __name__ == "__main__":
  main()
