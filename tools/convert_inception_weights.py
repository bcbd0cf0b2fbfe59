"""Convert pytorch-FID / torchvision InceptionV3 weights to the flat npz
consumed by soft_truncation_tpu.eval.inception_v3.load_params_npz.

Run this ONCE on a machine that has the weights available (either the
pytorch-fid checkpoint 'pt_inception-2015-12-05-6726825d.pth', the
torchscript 'inception-2015-12-05.pt' used by cleanfid, or torchvision's
pretrained inception_v3), then ship the npz to <assetdir>/
inception_v3_weights.npz.

Usage:
  python tools/convert_inception_weights.py <state_dict.pth> <out.npz>
"""

import sys

import numpy as np
import torch


def convert(state_dict, out_path):
  out = {}
  for key, tensor in state_dict.items():
    t = tensor.detach().cpu().numpy()
    parts = key.split(".")
    if parts[0] == "AuxLogits":  # training-only head, absent in the port
      continue
    # torchvision names: Mixed_5b.branch1x1.conv.weight / .bn.weight ...
    if parts[-2] == "conv" and parts[-1] == "weight":
      name = "/".join(parts[:-2]) + "/conv/kernel"
      out[name] = np.transpose(t, (2, 3, 1, 0))  # OIHW -> HWIO
    elif parts[-2] == "bn":
      mapping = {"weight": "bn_scale", "bias": "bn_bias",
                 "running_mean": "bn_mean", "running_var": "bn_var"}
      if parts[-1] in mapping:
        out["/".join(parts[:-2]) + "/" + mapping[parts[-1]]] = t
    elif parts[0] == "fc":
      if parts[-1] == "weight":
        out["fc/kernel"] = np.transpose(t)
      else:
        out["fc/bias"] = t
  np.savez_compressed(out_path, **out)
  print(f"wrote {out_path}: {len(out)} tensors")


def main():
  src, dst = sys.argv[1], sys.argv[2]
  obj = torch.load(src, map_location="cpu", weights_only=False)
  if hasattr(obj, "state_dict"):
    obj = obj.state_dict()
  convert(obj, dst)


if __name__ == "__main__":
  main()
