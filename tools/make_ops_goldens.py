"""Offline golden generator for resampling ops: runs the reference's
CPU torch implementations (op/upfirdn2d.py native path and
models/up_or_down_sampling.py wrappers) and dumps fixtures.

Development tooling only; the committed artifact is tests/golden/ops_golden.npz.

Usage: python tools/make_ops_goldens.py
"""

import sys

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

# The reference JIT-compiles CUDA extensions at import; stub that out so the
# CPU-only native paths are importable in this CUDA-less container.
import torch.utils.cpp_extension

torch.utils.cpp_extension.load = lambda *a, **k: None

from op.upfirdn2d import upfirdn2d_native
from models import up_or_down_sampling as uds

OUT = "tests/golden/ops_golden.npz"


def main():
  torch.manual_seed(0)
  out = {}

  x = torch.randn(2, 3, 9, 9)
  out["x"] = x.numpy()
  k = torch.tensor(np.outer([1., 3., 3., 1.], [1., 3., 3., 1.]) / 64.,
                   dtype=torch.float32)
  out["k"] = k.numpy()

  cases = [
      # (up, down, pad0, pad1)
      (1, 1, 2, 1),
      (2, 1, 3, 1),
      (1, 2, 2, 1),
      (2, 2, 2, 2),
      (1, 1, -1, 2),   # negative pad = crop
      (3, 1, 4, 2),
      (1, 3, 3, 2),
  ]
  for i, (up, down, p0, p1) in enumerate(cases):
    y = upfirdn2d_native(x, k, up, up, down, down, p0, p1, p0, p1)
    out[f"case{i}"] = y.numpy()
    out[f"case{i}_params"] = np.array([up, down, p0, p1])

  # asymmetric kernel
  k2 = torch.tensor([[1., 2., 1.], [2., 4., 2.]], dtype=torch.float32) / 12.
  out["k2"] = k2.numpy()
  out["asym"] = upfirdn2d_native(x, k2, 2, 2, 1, 1, 1, 1, 2, 0).numpy()

  # wrappers (fir_kernel = (1,3,3,1), factor 2)
  fir = [1, 3, 3, 1]
  out["upsample_2d"] = uds.upsample_2d(x, fir, factor=2).numpy()
  out["downsample_2d_in"] = None
  x8 = torch.randn(2, 3, 8, 8)
  out["x8"] = x8.numpy()
  out["downsample_2d"] = uds.downsample_2d(x8, fir, factor=2).numpy()
  out["naive_up"] = uds.naive_upsample_2d(x8, factor=2).numpy()
  out["naive_down"] = uds.naive_downsample_2d(x8, factor=2).numpy()

  # NOTE: the reference's upsample_conv_2d crashes on any torch
  # (models/up_or_down_sampling.py:126 uses negative-step slicing, which
  # torch rejects). Golden below uses the INTENDED StyleGAN2 semantics:
  # the same function with torch.flip for the spatial kernel flip.
  import torch.nn.functional as F

  def upsample_conv_2d_intended(x_, w_, k_, factor=2, gain=1):
    convH, convW = w_.shape[2], w_.shape[3]
    inC = w_.shape[1]
    kk = uds._setup_kernel(k_) * (gain * (factor ** 2))
    p = (kk.shape[0] - factor) - (convW - 1)
    num_groups = x_.shape[1] // inC
    wt = w_.reshape(num_groups, -1, inC, convH, convW)
    wt = torch.flip(wt, [3, 4]).permute(0, 2, 1, 3, 4)
    wt = wt.reshape(num_groups * inC, -1, convH, convW)
    y = F.conv_transpose2d(x_, wt, stride=factor, output_padding=0, padding=0)
    kt = torch.tensor(kk, dtype=torch.float32)
    pad = ((p + 1) // 2 + factor - 1, p // 2 + 1)
    return upfirdn2d_native(y, kt, 1, 1, 1, 1, pad[0], pad[1], pad[0], pad[1])

  w = torch.randn(5, 3, 3, 3)  # (outC, inC, kh, kw)
  out["w"] = w.numpy()
  out["upsample_conv_2d"] = upsample_conv_2d_intended(x8, w, fir).numpy()
  out["conv_downsample_2d"] = uds.conv_downsample_2d(x8, w, k=fir).numpy()
  # 1x1 conv resample variants (kernel=1 path used by Conv2d module)
  w1 = torch.randn(4, 3, 1, 1)
  out["w1"] = w1.numpy()
  out["upsample_conv_1x1"] = upsample_conv_2d_intended(x8, w1, fir).numpy()
  out["conv_downsample_1x1"] = uds.conv_downsample_2d(x8, w1, k=fir).numpy()

  np.savez(OUT, **{k_: v for k_, v in out.items() if v is not None})
  print(f"wrote {OUT}: {sorted(out)}")


if __name__ == "__main__":
  main()
