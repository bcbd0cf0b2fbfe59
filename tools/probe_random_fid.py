"""Probe: does random-feature FID discriminate, and does He-rescaling
(conv kernels x sqrt(2), compensating ReLU's variance halving) fix the
feature collapse of the flax-default (LeCun-normal) random InceptionV3?

Round-4 context: the metric-discrimination curve run logged FID ~2e-4
and IS = 1.0 at EVERY snapshot — the pool_3 features of the LeCun-init
net decay through ~48 conv+ReLU layers to near-constants, so FID (which
is quadratic in feature scale) sits at numerical-noise level and cannot
discriminate sample quality. This probe measures, on CPU with a small
batch:
  - pool_3 feature std under the shipped npz vs He-rescaled copies
  - FID(val vs val') (same distribution — should be small) vs
    FID(val vs noise) (different — should be >>), i.e. actual
    discrimination power, under each gain.

Usage: python tools/probe_random_fid.py [n_imgs]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")  # host-only probe
import jax.numpy as jnp


def fid(f1, f2):
  from soft_truncation_tpu.eval.metrics import frechet_distance
  m1, s1 = f1.mean(0), np.cov(f1, rowvar=False)
  m2, s2 = f2.mean(0), np.cov(f2, rowvar=False)
  return frechet_distance(m1, s1, m2, s2)


def main():
  n = int(sys.argv[1]) if len(sys.argv) > 1 else 64

  from soft_truncation_tpu.eval.inception import FlaxInceptionExtractor

  npz = "workdirs/assets/inception_v3_weights.npz"
  base = dict(np.load(npz))

  rng = np.random.RandomState(0)
  # synthetic-val-like images (low-freq) and pure-noise images, uint8
  base_imgs = rng.randint(0, 256, size=(2 * n, 4, 4, 3)).astype(np.float32)
  val = np.clip(np.asarray(jax.image.resize(
      jnp.asarray(base_imgs), (2 * n, 32, 32, 3), "linear")), 0,
      255).astype(np.uint8)
  val, val2 = val[:n], val[n:]
  noise = rng.randint(0, 256, size=(n, 32, 32, 3)).astype(np.uint8)

  for gain, tag in ((1.0, "lecun (shipped)"), (float(np.sqrt(2.0)), "sqrt2"),
                    (1.6, "x1.6")):
    scaled = {k: (v * gain if v.ndim == 4 else v) for k, v in base.items()}
    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
      tmp = f.name
    np.savez(tmp, **scaled)
    ext = FlaxInceptionExtractor(tmp, batch_size=32, resize_mode="device")
    os.unlink(tmp)
    fv, pv = ext(val)
    fv2, _ = ext(val2)
    fn_, _ = ext(noise)
    same, diff = fid(fv, fv2), fid(fv, fn_)
    print(f"[{tag:>15}] pool3 std {fv.std():.3e} |mean| "
          f"{np.abs(fv).mean():.3e} probs-std {pv.std():.2e} "
          f"fid(val,val') {same:.4g} fid(val,noise) {diff:.4g} "
          f"ratio {diff / max(same, 1e-30):.1f}", flush=True)


if __name__ == "__main__":
  main()
