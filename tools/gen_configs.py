"""Generate soft_truncation_tpu experiment configs from the reference's
observed config VALUES (not code), and dump a golden JSON for tests.

For every configs/**/<name>.py in the reference, this tool:
  1. imports it (torch stubbed to CPU) and materializes get_config()
  2. diffs the values against our default_config(<dataset family>)
  3. emits soft_truncation_tpu/configs/<same path> in our override format
  4. records the full value dict in tests/golden/configs_golden.json

Development tooling only. Usage: python tools/gen_configs.py
"""

import importlib.util
import json
import os
import re
import sys

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.getcwd())

REF = "/root/reference/configs"
OUT = "soft_truncation_tpu/configs"
GOLD = "tests/golden/configs_golden.json"

SECTION_ORDER = ["training", "sampling", "eval", "data", "model", "optim"]


def load_ref_config(path):
  name = "refcfg_" + re.sub(r"\W", "_", path)
  spec = importlib.util.spec_from_file_location(name, path)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod.get_config()


def family_of(path):
  text = open(path).read()
  m = re.search(r"default_(\w+)_configs", text)
  return m.group(1) if m else None


def norm(v):
  if isinstance(v, tuple):
    return list(v)
  return v


def to_plain(cfg):
  d = {}
  for k, v in cfg.to_dict().items():
    if k == "device":
      continue
    if isinstance(v, dict):
      d[k] = {k2: norm(v2) for k2, v2 in v.items()}
    else:
      d[k] = norm(v)
  return d


_TUPLE_KEYS = {"ch_mult", "attn_resolutions"}  # tuples in the reference
# (fir_kernel is a list there; types preserved so CLI flag overrides work)


def fmt(v, key=None):
  if key in _TUPLE_KEYS and isinstance(v, list):
    return repr(tuple(v))
  return repr(v)


def main():
  from soft_truncation_tpu.configs.base import default_config

  golden = {}
  for root, _, files in os.walk(REF):
    for f in sorted(files):
      if not f.endswith(".py") or f.startswith("default_"):
        continue
      path = os.path.join(root, f)
      rel = os.path.relpath(path, REF)
      fam = family_of(path)
      if fam is None:
        # self-contained config (ve/ffhq_1024_uncsn.py); diff against the
        # cifar10 defaults — the override carries every differing value.
        fam = "cifar10"
      ref_cfg = to_plain(load_ref_config(path))
      golden[rel] = ref_cfg

      ours_default = to_plain(default_config(fam))
      diffs = {}
      for sec, vals in ref_cfg.items():
        if not isinstance(vals, dict):
          if sec not in ours_default or ours_default[sec] != vals:
            diffs[sec] = vals
          continue
        base_vals = ours_default.get(sec, {})
        changed = {k: v for k, v in vals.items()
                   if k not in base_vals or base_vals[k] != v}
        if changed:
          diffs[sec] = changed

      lines = [
          f'"""{rel}: values verified against the reference config."""',
          "",
          "from soft_truncation_tpu.configs.base import default_config, override",
          "",
          "",
          "def get_config():",
          f"  config = default_config({fam!r})",
          "  return override(config, {",
      ]
      keys = [s for s in SECTION_ORDER if s in diffs] + \
             [s for s in diffs if s not in SECTION_ORDER]
      for sec in keys:
        vals = diffs[sec]
        if not isinstance(vals, dict):
          lines.append(f"      {sec!r}: {fmt(vals)},")
          continue
        lines.append(f"      {sec!r}: dict(")
        for k, v in vals.items():
          lines.append(f"          {k}={fmt(v, k)},")
        lines.append("      ),")
      lines += ["  })", ""]

      out_path = os.path.join(OUT, rel)
      os.makedirs(os.path.dirname(out_path), exist_ok=True)
      with open(out_path, "w") as fh:
        fh.write("\n".join(lines))
      print(f"wrote {out_path} ({len(diffs)} sections changed)")

  with open(GOLD, "w") as fh:
    json.dump(golden, fh, indent=1, sort_keys=True)
  print(f"wrote {GOLD} with {len(golden)} configs")


if __name__ == "__main__":
  main()
