"""Convert InceptionV3 weights to the flat npz consumed by
soft_truncation_tpu.eval.inception_v3.load_params_npz.

Accepts BOTH weight layouts the reference ecosystem uses
(cleanfid/features.py:13-68):

  1. pytorch-FID / torchvision naming ('pt_inception-2015-12-05-6726825d
     .pth', cleanfid/inception_pytorch.py:218-325):
       Mixed_5b.branch1x1.conv.weight, Mixed_5b.branch1x1.bn.weight, ...
  2. NVIDIA torchscript naming ('inception-2015-12-05.pt', the clean-mode
     default extractor, cleanfid/features.py:27-47): the TF-2015 graph
     names as module paths —
       layers.mixed.tower.conv.conv.weight, layers.conv_2.bn.bias,
       output.weight, ...
     Both files carry the SAME TF-2015 weights; only the module naming
     differs, so layout 2 is mapped onto layout 1's names first. The TF
     network's BatchNorms have no scale (gamma == 1); missing bn scales
     are filled with ones.

Unrecognized keys RAISE (except AuxLogits.* and *.num_batches_tracked):
a silently-partial npz would surface as garbage FID numbers much later.

Run this ONCE on a machine that has the weights available, then ship the
npz to <assetdir>/inception_v3_weights.npz.

Usage:
  python tools/convert_inception_weights.py <weights.pth|.pt> <out.npz>
"""

import sys

import numpy as np


# TF-2015 top-level cell -> torchvision module (pytorch-FID conversion map,
# cf. cleanfid/inception_pytorch.py architecture)
TS_TOP = {
    "conv": "Conv2d_1a_3x3", "conv_1": "Conv2d_2a_3x3",
    "conv_2": "Conv2d_2b_3x3", "conv_3": "Conv2d_3b_1x1",
    "conv_4": "Conv2d_4a_3x3",
    "mixed": "Mixed_5b", "mixed_1": "Mixed_5c", "mixed_2": "Mixed_5d",
    "mixed_3": "Mixed_6a", "mixed_4": "Mixed_6b", "mixed_5": "Mixed_6c",
    "mixed_6": "Mixed_6d", "mixed_7": "Mixed_6e", "mixed_8": "Mixed_7a",
    "mixed_9": "Mixed_7b", "mixed_10": "Mixed_7c",
}

_INCEPTION_A = {  # Mixed_5b/5c/5d
    "conv": "branch1x1",
    "tower.conv": "branch5x5_1", "tower.conv_1": "branch5x5_2",
    "tower_1.conv": "branch3x3dbl_1", "tower_1.conv_1": "branch3x3dbl_2",
    "tower_1.conv_2": "branch3x3dbl_3",
    "tower_2.conv": "branch_pool",
}
_INCEPTION_B = {  # Mixed_6a
    "conv": "branch3x3",
    "tower.conv": "branch3x3dbl_1", "tower.conv_1": "branch3x3dbl_2",
    "tower.conv_2": "branch3x3dbl_3",
}
_INCEPTION_C = {  # Mixed_6b..6e
    "conv": "branch1x1",
    "tower.conv": "branch7x7_1", "tower.conv_1": "branch7x7_2",
    "tower.conv_2": "branch7x7_3",
    "tower_1.conv": "branch7x7dbl_1", "tower_1.conv_1": "branch7x7dbl_2",
    "tower_1.conv_2": "branch7x7dbl_3", "tower_1.conv_3": "branch7x7dbl_4",
    "tower_1.conv_4": "branch7x7dbl_5",
    "tower_2.conv": "branch_pool",
}
_INCEPTION_D = {  # Mixed_7a
    "tower.conv": "branch3x3_1", "tower.conv_1": "branch3x3_2",
    "tower_1.conv": "branch7x7x3_1", "tower_1.conv_1": "branch7x7x3_2",
    "tower_1.conv_2": "branch7x7x3_3", "tower_1.conv_3": "branch7x7x3_4",
}
_INCEPTION_E = {  # Mixed_7b/7c
    "conv": "branch1x1",
    "tower.conv": "branch3x3_1",
    "tower.mixed.conv": "branch3x3_2a", "tower.mixed.conv_1": "branch3x3_2b",
    "tower_1.conv": "branch3x3dbl_1", "tower_1.conv_1": "branch3x3dbl_2",
    "tower_1.mixed.conv": "branch3x3dbl_3a",
    "tower_1.mixed.conv_1": "branch3x3dbl_3b",
    "tower_2.conv": "branch_pool",
}

TS_BRANCH = {
    "Mixed_5b": _INCEPTION_A, "Mixed_5c": _INCEPTION_A,
    "Mixed_5d": _INCEPTION_A,
    "Mixed_6a": _INCEPTION_B,
    "Mixed_6b": _INCEPTION_C, "Mixed_6c": _INCEPTION_C,
    "Mixed_6d": _INCEPTION_C, "Mixed_6e": _INCEPTION_C,
    "Mixed_7a": _INCEPTION_D,
    "Mixed_7b": _INCEPTION_E, "Mixed_7c": _INCEPTION_E,
}

# cell-leaf aliases: the scripted module may expose BN stats under torch
# names or TF names
_LEAF_ALIASES = {
    "conv.weight": "conv.weight",
    "bn.weight": "bn.weight", "bn.gamma": "bn.weight",
    "bn.bias": "bn.bias", "bn.beta": "bn.bias",
    "bn.running_mean": "bn.running_mean", "bn.mean": "bn.running_mean",
    "bn.running_var": "bn.running_var", "bn.var": "bn.running_var",
}


def torchscript_key_to_torchvision(key):
  """'layers.mixed_4.tower.conv_1.bn.bias' -> 'Mixed_6b.branch7x7_2.bn.bias'
  (None if the key is not in the torchscript layout)."""
  parts = key.split(".")
  if parts[0] == "output":  # final Linear -> fc
    return "fc." + ".".join(parts[1:])
  if parts[0] != "layers" or len(parts) < 4:
    return None
  top = TS_TOP.get(parts[1])
  if top is None:
    raise ValueError(f"unrecognized torchscript cell in key: {key}")
  leaf = _LEAF_ALIASES.get(".".join(parts[-2:]))
  if leaf is None:
    raise ValueError(f"unrecognized torchscript leaf in key: {key}")
  mid = ".".join(parts[2:-2])
  if not mid:  # plain stem conv: layers.conv_2.conv.weight
    return f"{top}.{leaf}"
  branch = TS_BRANCH[top].get(mid)
  if branch is None:
    raise ValueError(f"unrecognized torchscript branch in key: {key}")
  return f"{top}.{branch}.{leaf}"


def _is_torchscript_layout(state_dict):
  return any(k.split(".")[0] in ("layers", "output") for k in state_dict)


def convert(state_dict, out_path):
  if _is_torchscript_layout(state_dict):
    state_dict = {torchscript_key_to_torchvision(k) or k: v
                  for k, v in state_dict.items()}
  out = {}
  unmapped = []
  for key, tensor in state_dict.items():
    t = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") \
        else np.asarray(tensor)
    parts = key.split(".")
    if parts[0] == "AuxLogits":  # training-only head, absent in the port
      continue
    if parts[-1] == "num_batches_tracked":  # torch BN bookkeeping
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
      else:
        unmapped.append(key)
    elif parts[0] == "fc":
      if parts[-1] == "weight":
        out["fc/kernel"] = np.transpose(t)
      elif parts[-1] == "bias":
        out["fc/bias"] = t
      else:
        unmapped.append(key)
    else:
      unmapped.append(key)
  if unmapped:
    raise ValueError(
        f"{len(unmapped)} unrecognized weight keys (first 10): "
        f"{sorted(unmapped)[:10]} — refusing to write a partial npz")
  # TF-2015 BatchNorms have no scale: fill gamma = 1 where absent
  for name in [n for n in out if n.endswith("/bn_bias")]:
    scale = name[:-len("bn_bias")] + "bn_scale"
    if scale not in out:
      out[scale] = np.ones_like(out[name])
  np.savez_compressed(out_path, **out)
  print(f"wrote {out_path}: {len(out)} tensors")


def load_source(src):
  """torch.load for state-dict checkpoints, torch.jit.load for the
  NVIDIA torchscript archive."""
  import torch
  try:
    obj = torch.load(src, map_location="cpu", weights_only=False)
  except Exception:
    obj = torch.jit.load(src, map_location="cpu")
  if hasattr(obj, "state_dict") and not isinstance(obj, dict):
    obj = obj.state_dict()
  return obj


def main():
  src, dst = sys.argv[1], sys.argv[2]
  convert(load_source(src), dst)


if __name__ == "__main__":
  main()
