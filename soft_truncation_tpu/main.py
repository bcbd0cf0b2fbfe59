"""CLI entry: python -m soft_truncation_tpu.main --config <cfg.py> \
    --workdir <dir> --mode {train,eval} [--assetdir ...] [--eval_folder ...]

Same surface as reference main.py:29-37 (minus the environment-specific
assetdir default walking four directories up, main.py:33-34).
"""

from __future__ import annotations

import logging
import os

from absl import app, flags
from ml_collections.config_flags import config_flags

FLAGS = flags.FLAGS

config_flags.DEFINE_config_file("config", None, "Training configuration.",
                                lock_config=False)
flags.DEFINE_string("workdir", None, "Work directory.")
flags.DEFINE_enum("mode", None, ["train", "eval"],
                  "Running mode: train or eval")
flags.DEFINE_string("assetdir", "assets/stats",
                    "Folder with dataset statistics / inception weights.")
flags.DEFINE_string("eval_folder", "eval",
                    "The folder name for storing evaluation results")
flags.mark_flags_as_required(["workdir", "config", "mode"])


def _setup_logging(workdir: str, filename: str) -> None:
  os.makedirs(workdir, exist_ok=True)
  handler = logging.StreamHandler(open(os.path.join(workdir, filename), "a"))
  handler.setFormatter(logging.Formatter(
      "%(levelname)s - %(filename)s - %(asctime)s - %(message)s"))
  logger = logging.getLogger()
  logger.addHandler(handler)
  logger.setLevel("INFO")


def _dump_config(config, workdir: str) -> None:
  with open(os.path.join(workdir, "config.txt"), "w") as f:
    for k, v in config.to_dict().items():
      f.write(f"{k}\n")
      if isinstance(v, dict):
        for k2, v2 in v.items():
          f.write(f"> {k2}: {v2}\n")
      f.write("\n\n")


def _setup_compilation_cache(config) -> None:
  """Persistent XLA compilation cache (config.tpu.compilation_cache_dir):
  high-res/sampler programs compile for minutes; cached reloads take
  seconds. Set the dir to '' to disable."""
  from .utils.compile_cache import setup_compilation_cache
  setup_compilation_cache(
      (config.get("tpu", {}) or {}).get("compilation_cache_dir", ""))


def _honor_jax_platforms_env() -> None:
  """Re-assert JAX_PLATFORMS from the environment via jax.config.

  Some managed runtimes register a PJRT plugin from sitecustomize and
  overwrite ``jax_platforms`` with their own selection at interpreter
  start (observed: axon's register() forces "axon,cpu"), silently
  ignoring the user's ``JAX_PLATFORMS=cpu``. Re-applying the env value
  before the first backend query restores the documented JAX contract."""
  env = os.environ.get("JAX_PLATFORMS")
  if env:
    import jax
    jax.config.update("jax_platforms", env)


def main(argv):
  del argv
  _honor_jax_platforms_env()
  from . import run_lib

  os.makedirs(FLAGS.workdir, exist_ok=True)
  _dump_config(FLAGS.config, FLAGS.workdir)
  _setup_compilation_cache(FLAGS.config)

  if FLAGS.mode == "train":
    _setup_logging(FLAGS.workdir, "stdout.txt")
    run_lib.train(FLAGS.config, FLAGS.workdir, FLAGS.assetdir)
  elif FLAGS.mode == "eval":
    os.makedirs(os.path.join(FLAGS.workdir, FLAGS.eval_folder),
                exist_ok=True)
    _setup_logging(FLAGS.workdir, "evaluation_history.txt")
    run_lib.evaluate(FLAGS.config, FLAGS.workdir, FLAGS.assetdir,
                     FLAGS.eval_folder)
  else:
    raise ValueError(f"Mode {FLAGS.mode} not recognized.")


if __name__ == "__main__":
  app.run(main)
