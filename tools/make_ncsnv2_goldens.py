"""Golden forward-parity fixtures for the NCSNv2 family: runs the
REFERENCE torch models (models/ncsnv2.py:43-416, CPU, eval mode) on tiny
configs and dumps state_dict + input/output.

Covers ncsnv2_64 / ncsnv2_128 / ncsnv2_256 (RefineNet CRP/RCU/MSF blocks,
dilated convs, InstanceNorm++, corner-aligned bilinear MSF fusion, sigma
scaling). NOT covered: 'ncsn' (NCSNv1) — unrunnable in the reference as
released: ConditionalResidualBlock's `dilation=None` default hits
`dilation > 1` (models/layers.py:419, TypeError at construction), and its
forward would pass y into the non-conditional InstanceNorm2dPlus that
NCSN supplies (models/ncsnv2.py:140, models/layers.py:438). Our NCSN
implements the intended (paper) conditional semantics.

Development tooling only; artifact = tests/golden/ncsnv2_golden_<name>.npz.
Usage: python tools/make_ncsnv2_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import torch

from make_ncsnpp_goldens import base_config  # noqa: E402  (installs shims)

# Reference bug: ncsn_conv3x3 does `conv.bias.data *= init_scale`
# unconditionally (models/layers.py:114), so every bias=False conv —
# i.e. every CRP/RCU conv (models/layers.py:138,190) — crashes at
# construction; the entire NCSNv2 family is unconstructible as released.
# Shim to the intended semantics (scale the bias only when present).
import torch.nn as _tnn  # noqa: E402
from models import layers as ref_layers  # noqa: E402  (reference)


def _fixed_ncsn_conv3x3(in_planes, out_planes, stride=1, bias=True,
                        dilation=1, init_scale=1.0, padding=1):
  init_scale = 1e-10 if init_scale == 0 else init_scale
  # Second reference bug: dilated call sites keep the default padding=1
  # (models/layers.py:464-480), so dilated ResidualBlocks shape-mismatch
  # at the skip add (models/layers.py:507). Intended ('SAME', as in the
  # upstream ncsnv2 repo): padding = dilation for a stride-1 3x3 conv.
  if dilation > 1 and padding == 1:
    padding = dilation
  conv = _tnn.Conv2d(in_planes, out_planes, stride=stride, bias=bias,
                     dilation=dilation, padding=padding, kernel_size=3)
  conv.weight.data *= init_scale
  if conv.bias is not None:
    conv.bias.data *= init_scale
  return conv


ref_layers.ncsn_conv3x3 = _fixed_ncsn_conv3x3

from models import ncsnv2 as ref_ncsnv2  # noqa: E402  (reference)

CASES = {
    # name: (model class, image_size)  — enough pixels for every
    # downsample level to stay >= 2
    "ncsnv2_64": (ref_ncsnv2.NCSNv2, 16),
    "ncsnv2_128": (ref_ncsnv2.NCSNv2_128, 32),
    "ncsnv2_256": (ref_ncsnv2.NCSNv2_256, 64),
}


def main():
  for name, (cls, image_size) in CASES.items():
    config = base_config()
    config.model.nf = 16
    config.model.num_scales = 10
    config.model.normalization = "InstanceNorm++"
    config.model.nonlinearity = "elu"
    config.data.channels = 3
    config.data.image_size = image_size
    config.data.centered = False

    torch.manual_seed(0)
    model = cls(config)
    model.eval()

    x = torch.rand(2, 3, image_size, image_size)
    y = torch.tensor([0, 9])  # sigma indices < num_scales
    with torch.no_grad():
      out = model(x, y)

    rec = {"x": x.numpy(), "y_labels": y.numpy(), "y": out.numpy(),
           "image_size": np.asarray(image_size)}
    for k, v in model.state_dict().items():
      rec["sd::" + k] = v.numpy()
    path = f"tests/golden/ncsnv2_golden_{name}.npz"
    np.savez(path, **rec)
    print(f"wrote {path}")


if __name__ == "__main__":
  main()
