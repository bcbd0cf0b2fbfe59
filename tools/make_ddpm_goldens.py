"""Golden forward-parity fixtures for the legacy DDPM U-Net: runs the
REFERENCE torch model (models/ddpm.py:40-181, CPU, eval mode) on tiny
configs and dumps state_dict + input/output.

Development tooling only; artifact = tests/golden/ddpm_golden_<name>.npz.
Usage: python tools/make_ddpm_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import torch

from make_ncsnpp_goldens import base_config  # noqa: E402  (installs shims)

from models import ddpm as ref_ddpm  # noqa: E402  (reference)

CASES = {
    # vp-style: centered data, no sigma scaling
    "vp": dict(scale_by_sigma=False, centered=True),
    # smld-style: uncentered data, output divided by sigma[label]
    "smld": dict(scale_by_sigma=True, centered=False),
}


def main():
  for name, case in CASES.items():
    config = base_config()
    config.model.nf = 32  # legacy blocks hardcode GroupNorm num_groups=32
    config.model.num_scales = 10
    config.model.scale_by_sigma = case["scale_by_sigma"]
    config.data.centered = case["centered"]

    torch.manual_seed(0)
    model = ref_ddpm.DDPM(config)
    model.eval()

    x = torch.rand(2, 3, 16, 16)  # data-space input, [0, 1)
    labels = torch.tensor([0, 9])  # discrete timesteps < num_scales
    with torch.no_grad():
      y = model(x, labels)

    out = {"x": x.numpy(), "labels": labels.numpy(), "y": y.numpy()}
    for k, v in model.state_dict().items():
      out["sd::" + k] = v.numpy()
    path = f"tests/golden/ddpm_golden_{name}.npz"
    np.savez(path, **out)
    print(f"wrote {path}")


if __name__ == "__main__":
  main()
