"""Golden forward-parity fixture for NCSNv1 ('ncsn', the conditional
RefineNet): the reference model is UNRUNNABLE as released (PARITY.md
bugs #10-12), so the golden runs it with every construction bug shimmed
to the evident intent:

  1. ncsn_conv3x3 bias=False crash (models/layers.py:114) — guard the
     bias scale (same shim as make_ncsnv2_goldens).
  2. ConditionalResidualBlock `dilation=None` default hits `dilation > 1`
     (models/layers.py:419) — treat None as undilated.
  3. NCSN passes the NON-conditional normalization into conditional
     blocks (models/ncsnv2.py:140 uses get_normalization(config) instead
     of conditional=True), so every `norm(x, y)` call would TypeError —
     use ConditionalInstanceNorm2dPlus (the NCSNv1 paper semantics, and
     what get_normalization(config, conditional=True) returns).

Our models/ncsnv2.NCSN implements exactly this intent, so the shimmed
reference is the parity target.

Development tooling only; artifact = tests/golden/ncsn_golden.npz.
Usage: python tools/make_ncsn_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import torch

# installs the cpp-extension/interpolate shims and, importantly, the
# fixed ncsn_conv3x3 (bug #1)
from make_ncsnv2_goldens import _fixed_ncsn_conv3x3  # noqa: E402
from models import layers as ref_layers  # noqa: E402  (reference)
from models import normalization as ref_norm  # noqa: E402  (reference)

_OrigCondRes = ref_layers.ConditionalResidualBlock


class _FixedCondResidualBlock(_OrigCondRes):
  """Bug #2: default dilation None -> undilated (1)."""

  def __init__(self, input_dim, output_dim, num_classes, resample=None,
               act=torch.nn.ELU(), normalization=None, adjust_padding=False,
               dilation=None):
    super().__init__(input_dim, output_dim, num_classes, resample=resample,
                     act=act, normalization=normalization,
                     adjust_padding=adjust_padding,
                     dilation=1 if dilation is None else dilation)


from make_ncsnpp_goldens import base_config  # noqa: E402

from models import ncsnv2 as ref_ncsnv2  # noqa: E402  (reference)

# bug #2 + #3 shims applied at the ncsnv2 module's import site
ref_ncsnv2.ConditionalResidualBlock = _FixedCondResidualBlock
# NCSN call sites pass num_classes positionally everywhere
# (norm(features, num_classes)), so the bare conditional class is the
# right intent-preserving substitute.
ref_ncsnv2.get_normalization = (
    lambda config, conditional=False: ref_norm.ConditionalInstanceNorm2dPlus)


def main():
  config = base_config()
  config.model.nf = 16
  config.model.num_scales = 10
  config.model.normalization = "InstanceNorm++"
  config.model.nonlinearity = "elu"
  config.data.channels = 3
  config.data.image_size = 16
  config.data.centered = False

  torch.manual_seed(0)
  model = ref_ncsnv2.NCSN(config)
  model.eval()

  x = torch.rand(2, 3, 16, 16)
  y = torch.tensor([0, 9])
  with torch.no_grad():
    out = model(x, y)

  rec = {"x": x.numpy(), "y_labels": y.numpy(), "y": out.numpy()}
  for k, v in model.state_dict().items():
    rec["sd::" + k] = v.numpy()
  path = "tests/golden/ncsn_golden.npz"
  np.savez(path, **rec)
  print(f"wrote {path}")


if __name__ == "__main__":
  main()
