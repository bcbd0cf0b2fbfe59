"""Port reference (PyTorch) NCSN++ checkpoints into Flax param pytrees.

The reference stores the network as a flat ``nn.ModuleList`` walked by a
running index (models/ncsnpp.py:74-256), so its state_dict keys are
``all_modules.<idx>.<param>``. This module re-derives that construction
order from the config and maps every torch tensor onto our named Flax
modules, converting layouts:

  conv weight   OIHW -> HWIO
  linear weight (out, in) -> (in, out)
  NIN W         (in, out) -> Dense kernel (already (in, out))
  GroupNorm     weight/bias -> scale/bias

Used by the migration path (load a reference .pth, keep training on TPU)
and by the golden forward-parity tests.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _conv(sd, prefix):
  out = {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))}
  if f"{prefix}.bias" in sd:
    out["bias"] = sd[f"{prefix}.bias"]
  return out


def _linear(sd, prefix):
  return {"kernel": np.transpose(sd[f"{prefix}.weight"]),
          "bias": sd[f"{prefix}.bias"]}


def _nin(sd, prefix):
  return {"kernel": sd[f"{prefix}.W"], "bias": sd[f"{prefix}.b"]}


def _gn(sd, prefix):
  return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _resblock(sd, prefix):
  """Either ResnetBlockBigGANpp or ResnetBlockDDPMpp (same field names,
  except the shortcut: Conv_2 for BigGAN / NIN_0 for DDPM)."""
  out = {
      "norm0": _gn(sd, f"{prefix}.GroupNorm_0"),
      "conv0": _conv(sd, f"{prefix}.Conv_0"),
      "norm1": _gn(sd, f"{prefix}.GroupNorm_1"),
      "conv1": _conv(sd, f"{prefix}.Conv_1"),
  }
  if f"{prefix}.Dense_0.weight" in sd:
    out["temb_proj"] = _linear(sd, f"{prefix}.Dense_0")
  if f"{prefix}.Conv_2.weight" in sd:
    out["shortcut"] = _conv(sd, f"{prefix}.Conv_2")
  elif f"{prefix}.NIN_0.W" in sd:
    out["shortcut"] = _nin(sd, f"{prefix}.NIN_0")
  return out


def _attn(sd, prefix):
  return {
      "norm": _gn(sd, f"{prefix}.GroupNorm_0"),
      "q": _nin(sd, f"{prefix}.NIN_0"),
      "k": _nin(sd, f"{prefix}.NIN_1"),
      "v": _nin(sd, f"{prefix}.NIN_2"),
      "out": _nin(sd, f"{prefix}.NIN_3"),
  }


def _resample(sd, prefix):
  """layerspp.Upsample/Downsample with params: either plain Conv_0 or the
  fused FIR ConvResample Conv2d_0."""
  if f"{prefix}.Conv2d_0.weight" in sd:
    return {"conv": {
        "kernel": np.transpose(sd[f"{prefix}.Conv2d_0.weight"], (2, 3, 1, 0)),
        "bias": sd[f"{prefix}.Conv2d_0.bias"],
    }}
  return {"conv": _conv(sd, f"{prefix}.Conv_0")}


def ncsnpp_module_order(config) -> List[Tuple[str, str]]:
  """(kind, flax_name) for each entry of the reference's all_modules list,
  in construction order (models/ncsnpp.py:74-256)."""
  m = config.model
  L = len(m.ch_mult)
  all_res = [config.data.image_size // (2 ** i) for i in range(L)]
  attn_res = tuple(m.attn_resolutions)
  attention = m.get("attention", True)
  aux = m.get("auxiliary_resblock", True)
  ddpm_block = m.resblock_type.lower() == "ddpm"
  prog = m.progressive.lower()
  prog_in = m.progressive_input.lower()

  order: List[Tuple[str, str]] = []
  if m.embedding_type.lower() == "fourier":
    order.append(("gauss", "fourier_emb"))
  if m.conditional:
    order.append(("linear", "temb_dense0"))
    order.append(("linear", "temb_dense1"))
  if m.get("fourier_feature", False):
    order.append(("none", "fixed_fourier"))
  order.append(("conv", "stem"))

  for i in range(L):
    for b in range(m.num_res_blocks):
      order.append(("res", f"down_{i}_{b}"))
      if all_res[i] in attn_res and attention:
        order.append(("attn", f"down_attn_{i}_{b}"))
    if i != L - 1:
      if ddpm_block:
        order.append(("resample", f"down_{i}_ds"))
      elif aux:
        order.append(("res", f"down_{i}_ds"))
      if prog_in == "input_skip":
        order.append(("combine", f"combine_{i}"))
      elif prog_in == "residual":
        order.append(("resample", f"pyr_ds_{i}"))

  order += [("res", "mid_res0"), ("attn", "mid_attn"), ("res", "mid_res1")]

  n_up = m.num_res_blocks + 1 if aux else m.num_res_blocks
  for i in reversed(range(L)):
    for b in range(n_up):
      order.append(("res", f"up_{i}_{b}"))
    if all_res[i] in attn_res and attention:
      order.append(("attn", f"up_attn_{i}"))
    if prog != "none":
      if i == L - 1 or prog == "output_skip":
        order.append(("gn", f"pyr_norm_{i}"))
        order.append(("conv", f"pyr_conv_{i}"))
      else:  # progressive == 'residual' at lower levels
        order.append(("resample", f"pyr_us_{i}"))
    if i != 0:
      if ddpm_block:
        order.append(("resample", f"up_{i}_us"))
      elif aux:
        order.append(("res", f"up_{i}_us"))

  if prog != "output_skip":
    order.append(("gn", "out_norm"))
    order.append(("conv", "out_conv"))
  return order


def ddpm_module_order(config) -> List[Tuple[str, str]]:
  """(kind, flax_name) per entry of the legacy DDPM's all_modules list,
  in construction order (models/ddpm.py:40-106)."""
  m = config.model
  L = len(m.ch_mult)
  all_res = [config.data.image_size // (2 ** i) for i in range(L)]
  attn_res = tuple(m.attn_resolutions)

  order: List[Tuple[str, str]] = []
  if m.conditional:
    order.append(("linear", "temb_dense0"))
    order.append(("linear", "temb_dense1"))
  order.append(("conv", "stem"))
  for i in range(L):
    for b in range(m.num_res_blocks):
      order.append(("res", f"down_{i}_{b}"))
      if all_res[i] in attn_res:
        order.append(("attn", f"down_attn_{i}_{b}"))
    if i != L - 1:
      order.append(("resample", f"down_{i}_ds"))
  order += [("res", "mid_res0"), ("attn", "mid_attn"), ("res", "mid_res1")]
  for i in reversed(range(L)):
    for b in range(m.num_res_blocks + 1):
      order.append(("res", f"up_{i}_{b}"))
    if all_res[i] in attn_res:
      order.append(("attn", f"up_attn_{i}"))
    if i != 0:
      order.append(("resample", f"up_{i}_us"))
  order += [("gn", "out_norm"), ("conv", "out_conv")]
  return order


def port_ddpm_state_dict(state_dict: Dict[str, np.ndarray],
                         config) -> Dict[str, Any]:
  """torch state_dict -> Flax params for models.ddpm.DDPM.from_config.
  The legacy DDPM reuses the ++ submodule names (GroupNorm_0/Conv_0/...,
  models/layers.py:558-661), so the same converters apply."""
  sd = {k.removeprefix("module."): np.asarray(v)
        for k, v in state_dict.items()}
  params: Dict[str, Any] = {}
  for idx, (kind, name) in enumerate(ddpm_module_order(config)):
    converted = _CONVERTERS[kind](sd, f"all_modules.{idx}")
    if converted is not None:
      params[name] = converted
  return params


_CONVERTERS = {
    "conv": _conv,
    "linear": _linear,
    "res": _resblock,
    "attn": _attn,
    "gn": _gn,
    "resample": _resample,
    "combine": lambda sd, p: {"conv": _conv(sd, f"{p}.Conv_0")},
    "gauss": lambda sd, p: {"W": sd[f"{p}.W"]},
    "none": lambda sd, p: None,
}


_NCSNV2_KEY_RULES = [
    # torch attribute path -> our Flax module path (models/ncsnv2.py,
    # models/refine.py keep the reference's naming modulo these renames)
    (r"res(\d+)\.(\d+)\.", lambda m: f"res{m[1]}_{m[2]}."),
    (r"normalize1\.", lambda m: "norm1."),
    (r"normalize2\.", lambda m: "norm2."),
    (r"adapt_convs\.(\d+)\.", lambda m: f"adapt_{m[1]}."),
    (r"output_convs\.", lambda m: "output."),
    (r"convs\.(\d+)\.", lambda m: f"conv_{m[1]}."),   # MSF/CRP conv lists
    (r"norms\.(\d+)\.", lambda m: f"norm_{m[1]}."),   # cond MSF/CRP norms
    # RCU convs/norms: reference names are 1-indexed '{i}_{j}_conv'
    # (models/layers.py:188-214); ours are 0-indexed 'conv_{i}_{j}'
    (r"(\d+)_(\d+)_conv\.",
     lambda m: f"conv_{int(m[1]) - 1}_{int(m[2]) - 1}."),
    (r"(\d+)_(\d+)_norm\.",
     lambda m: f"norm_{int(m[1]) - 1}_{int(m[2]) - 1}."),
]


def port_ncsnv2_state_dict(state_dict: Dict[str, np.ndarray],
                           config=None) -> Dict[str, Any]:
  """torch state_dict -> Flax params for the NCSNv1/v2 family
  (models/ncsnv2.py:43-416). Unlike NCSN++'s flat ModuleList, these
  models use named attributes, so the port is a systematic key rewrite
  plus layout conversion (conv OIHW->HWIO, Embedding weight->embedding).
  """
  import re

  params: Dict[str, Any] = {}
  for key, value in state_dict.items():
    key = key.removeprefix("module.")
    if key == "sigmas" or ".instance_norm." in key:
      continue  # buffer / param-free torch InstanceNorm2d
    for pat, repl in _NCSNV2_KEY_RULES:
      key = re.sub(pat, repl, key)
    parts = key.split(".")
    leaf, path = parts[-1], parts[:-1]
    value = np.asarray(value)
    if leaf == "weight":
      if value.ndim == 4:  # conv
        leaf, value = "kernel", np.transpose(value, (2, 3, 1, 0))
        path = path + ["Conv_0"]  # NCSNConv wraps one anonymous nn.Conv
      elif path and path[-1] == "embed":  # nn.Embedding -> nn.Embed
        leaf = "embedding"
      else:  # nn.Linear
        leaf, value = "kernel", np.transpose(value)
    elif leaf == "bias":  # all v2-family biases are conv biases
      path = path + ["Conv_0"]
    node = params
    for p in path:
      node = node.setdefault(p, {})
    node[leaf] = value
  return params


def load_reference_checkpoint(path: str, config):
  """Migration path: load a reference torch checkpoint
  ({optimizer, model, ema, step}, utils.py:29-36) and return
  (params, ema_params, step) as Flax pytrees for TrainState.

  Requires torch at call time (CPU-only is fine). EMA shadow params are
  stored as a flat list in registration order (models/ema.py:28-29),
  which matches the state_dict parameter order of requires_grad params.
  """
  import torch  # local import: torch is optional at runtime

  name = config.model.name.lower()
  if name == "ncsnpp":
    porter = port_ncsnpp_state_dict
  elif name == "ddpm":
    porter = port_ddpm_state_dict
  elif name in ("ncsnv2_64", "ncsn", "ncsnv2_128", "ncsnv2_256"):
    porter = port_ncsnv2_state_dict
  else:
    raise ValueError(f"no porter for model {config.model.name}")

  ckpt = torch.load(path, map_location="cpu", weights_only=False)
  model_sd = {k: v.numpy() for k, v in ckpt["model"].items()}
  params = porter(model_sd, config)

  ema_params = params
  ema = ckpt.get("ema")
  if ema and "shadow_params" in ema:
    # EMA shadow params are a flat list in parameters() order
    # (models/ema.py:28-29) == state_dict order minus buffers ('sigmas')
    # minus requires_grad=False tensors (the GaussianFourier W).
    shadow = [p.numpy() for p in ema["shadow_params"]]
    ema_sd = dict(model_sd)
    si = 0
    for k, v in ckpt["model"].items():
      if k.endswith("sigmas"):
        continue  # registered buffer, not a parameter
      if (k.endswith("all_modules.0.W") and name == "ncsnpp"
          and config.model.get("embedding_type") == "fourier"):
        continue  # frozen Fourier W: absent from shadow_params
      assert si < len(shadow) and tuple(shadow[si].shape) == tuple(v.shape), (
          f"EMA shadow mismatch at {k}")
      ema_sd[k] = shadow[si]
      si += 1
    assert si == len(shadow), (si, len(shadow))
    ema_params = porter(ema_sd, config)

  step = int(ckpt.get("step", 0))
  return params, ema_params, step


def port_ncsnpp_state_dict(state_dict: Dict[str, np.ndarray],
                           config) -> Dict[str, Any]:
  """torch state_dict (numpy values; 'module.'/'all_modules.' keys ok) ->
  Flax params dict for models.ncsnpp.NCSNpp.from_config(config)."""
  sd = {}
  for k, v in state_dict.items():
    k = k.removeprefix("module.")
    sd[k] = np.asarray(v)

  params: Dict[str, Any] = {}
  for idx, (kind, name) in enumerate(ncsnpp_module_order(config)):
    converted = _CONVERTERS[kind](sd, f"all_modules.{idx}")
    if converted is not None:
      params[name] = converted
  return params
