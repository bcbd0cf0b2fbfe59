"""Golden forward-parity fixtures for NCSN++: runs the REFERENCE torch
model (CPU, eval mode) on tiny configs and dumps state_dict + input/output.

Development tooling only; artifact = tests/golden/ncsnpp_golden_<name>.npz.
Usage: python tools/make_ncsnpp_goldens.py
"""

import sys

sys.path.insert(0, "/root/reference")

import ml_collections
import numpy as np
import torch
import torch.utils.cpp_extension

torch.utils.cpp_extension.load = lambda *a, **k: None

# The reference's non-FIR Upsample calls
# F.interpolate(x, (H*2, W*2), 'nearest') — 'nearest' lands in the
# positional scale_factor slot and raises on any modern torch
# (models/layerspp.py:130). Shim to the intended semantics.
import torch.nn.functional as _F

_orig_interpolate = _F.interpolate


def _fixed_interpolate(input, size=None, scale_factor=None, mode="nearest",
                       **kw):
  if isinstance(scale_factor, str):
    mode, scale_factor = scale_factor, None
  return _orig_interpolate(input, size=size, scale_factor=scale_factor,
                           mode=mode, **kw)


_F.interpolate = _fixed_interpolate

from models import ncsnpp  # noqa: E402  (reference)


def base_config():
  config = ml_collections.ConfigDict()
  config.training = t = ml_collections.ConfigDict()
  t.continuous = True
  t.sde = "vesde"
  config.data = d = ml_collections.ConfigDict()
  d.image_size = 16
  d.num_channels = 3
  d.centered = True
  config.model = m = ml_collections.ConfigDict()
  m.nf = 16
  m.ch_mult = (1, 2)
  m.num_res_blocks = 1
  m.attn_resolutions = (8,)
  m.attention = True
  m.dropout = 0.1
  m.resamp_with_conv = True
  m.conditional = True
  m.fir = False
  m.fir_kernel = [1, 3, 3, 1]
  m.skip_rescale = True
  m.resblock_type = "biggan"
  m.auxiliary_resblock = True
  m.progressive = "none"
  m.progressive_input = "none"
  m.progressive_combine = "sum"
  m.embedding_type = "fourier"
  m.fourier_feature = False
  m.fourier_scale = 16
  m.init_scale = 0.0
  m.nonlinearity = "swish"
  m.scale_by_sigma = False
  m.lsgm = False
  m.embedding_dim = 128
  m.sigma_min = 0.01
  m.sigma_max = 50.0
  m.num_scales = 1000
  m.beta_min = 0.1
  m.beta_max = 20.0
  m.normalization = "GroupNorm"
  return config


CASES = {
    "uncsnpp": dict(fir=True, progressive_input="residual",
                    scale_by_sigma=True),
    "progressive": dict(progressive="output_skip",
                        progressive_input="input_skip",
                        progressive_combine="cat", fourier_feature=True,
                        fir=True),
    "ddpmpp": dict(resblock_type="ddpm", embedding_type="positional"),
}


def main():
  for name, overrides in CASES.items():
    config = base_config()
    for k, v in overrides.items():
      setattr(config.model, k, v)

    torch.manual_seed(0)
    model = ncsnpp.NCSNpp(config, sde=None)
    model.eval()

    x = torch.randn(2, 3, 16, 16)
    if config.model.embedding_type == "fourier":
      t = torch.tensor([1.0, 10.0])
    else:
      t = torch.tensor([3.0, 999.0])
    with torch.no_grad():
      y = model(x, t)

    out = {"x": x.numpy(), "t": t.numpy(), "y": y.numpy()}
    for k, v in model.state_dict().items():
      out["sd::" + k] = v.numpy()
    path = f"tests/golden/ncsnpp_golden_{name}.npz"
    np.savez(path, **out)
    n_params = sum(v.numel() for k, v in model.state_dict().items()
                   if k != "sigmas")
    print(f"wrote {path}  (params={n_params})")


if __name__ == "__main__":
  main()
