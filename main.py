"""Reference-compatible CLI shim: the reference is driven as

    python main.py --config configs/vp/CIFAR10/ddpmpp_nll_st.py \
        --workdir <dir> --mode train

(reference main.py:29-37 + README.md run commands). This repo's package
entry is ``python -m soft_truncation_tpu.main`` with configs under
``soft_truncation_tpu/configs/`` — this shim accepts the reference's
literal command line from the repo root: a ``--config`` pointing at a
``configs/...`` path that only exists under the package is rewritten to
``soft_truncation_tpu/configs/...`` before flag parsing. Everything else
passes through unchanged.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))


def _rewrite_config_path(argv):
  out = list(argv)
  for i, arg in enumerate(out):
    if arg == "--config" and i + 1 < len(out):
      key, val, j = arg, out[i + 1], i + 1
    elif arg.startswith("--config="):
      key, val = arg.split("=", 1)
      j = i
    else:
      continue
    if key != "--config":
      continue
    # ml_collections allows "--config path:config_string" suffixes.
    path, sep, rest = val.partition(":")
    candidate = os.path.join(_HERE, "soft_truncation_tpu", path)
    # Guard on the path exactly as ml_collections would resolve it
    # (cwd-relative): only rewrite when the user's path does NOT exist,
    # so a cwd-local configs/ tree is never hijacked.
    if not os.path.exists(path) and os.path.exists(candidate):
      newval = candidate + sep + rest
      out[j] = newval if j != i else f"--config={newval}"
    break
  return out


if __name__ == "__main__":
  sys.argv = _rewrite_config_path(sys.argv)
  from absl import app
  from soft_truncation_tpu.main import main
  app.run(main)
