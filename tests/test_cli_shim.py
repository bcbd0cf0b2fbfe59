"""Unit tests for the root-level reference-compatible CLI shim
(main.py): `python main.py --config configs/...` — the reference's
literal command line (reference main.py:29-37) — must resolve configs
that live under soft_truncation_tpu/configs/."""

import importlib.util
import os
import sys

_ROOT = os.path.join(os.path.dirname(__file__), "..")
_spec = importlib.util.spec_from_file_location(
    "root_main_shim", os.path.join(_ROOT, "main.py"))
shim = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(shim)  # safe: the entry body is __main__-gated

REF_STYLE = "configs/vp/CIFAR10/ddpmpp_nll_st.py"
PKG_STYLE = os.path.join(_ROOT, "soft_truncation_tpu", REF_STYLE)


def test_space_separated_rewritten():
  argv = ["main.py", "--config", REF_STYLE, "--mode", "train"]
  out = shim._rewrite_config_path(argv)
  assert out[2].endswith("soft_truncation_tpu/" + REF_STYLE)
  assert os.path.exists(out[2])
  assert out[0] == "main.py" and out[3:] == ["--mode", "train"]


def test_equals_form_rewritten():
  out = shim._rewrite_config_path(["main.py", f"--config={REF_STYLE}"])
  assert out[1].startswith("--config=")
  assert out[1].split("=", 1)[1].endswith("soft_truncation_tpu/" + REF_STYLE)


def test_config_string_suffix_preserved():
  out = shim._rewrite_config_path(
      ["main.py", "--config", REF_STYLE + ":tuning"])
  assert out[2].endswith(REF_STYLE + ":tuning")
  assert "soft_truncation_tpu" in out[2]


def test_package_path_untouched():
  argv = ["main.py", "--config", "soft_truncation_tpu/" + REF_STYLE]
  assert shim._rewrite_config_path(argv) == argv


def test_nonexistent_path_untouched():
  argv = ["main.py", "--config", "configs/nope/missing.py"]
  assert shim._rewrite_config_path(argv) == argv


def test_other_flags_untouched():
  argv = ["main.py", "--config.training.n_iters", "3", "--workdir", "w"]
  assert shim._rewrite_config_path(argv) == argv


def test_cwd_local_config_not_hijacked(tmp_path, monkeypatch):
  """ml_collections resolves --config relative to the cwd; a user running
  the shim from a directory with its OWN configs/ tree (e.g. the reference
  checkout) must get their file, not the packaged one."""
  local = tmp_path / "configs" / "vp" / "CIFAR10"
  local.mkdir(parents=True)
  (local / "ddpmpp_nll_st.py").write_text("# the user's own config\n")
  monkeypatch.chdir(tmp_path)
  argv = ["main.py", "--config", REF_STYLE, "--mode", "train"]
  assert shim._rewrite_config_path(argv) == argv
