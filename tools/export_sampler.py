"""Export a trained sampler as a self-contained serving artifact.

Produces the deployment pair consumed by soft_truncation_tpu.serve.server:

  <out>.stsrv       AOT-compiled sampling program (jax.export StableHLO
                    + meta header; see serve/export.py)
  <out>.params.npz  path-flattened EMA parameters

Usage:
  python tools/export_sampler.py --config <config.py> --workdir <dir>
      --out <prefix> [--batch N] [--platforms tpu,cpu] [--devices N]
      [--cpu]

--workdir restores the latest EMA checkpoint (the weights a production
sampler serves); without it the artifact gets random-init weights (smoke
tests only — a loud warning is printed). --platforms lowers for targets
this host may not have (export on a CPU box, serve on TPU). --cpu pins
jax to the host CPU before any device op (required on this machine when
the TPU tunnel is wedged — see CLAUDE.md).
"""

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_config(path: str):
  spec = importlib.util.spec_from_file_location("c", path)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod.get_config()


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
  p.add_argument("--config", required=True)
  p.add_argument("--workdir", default=None)
  p.add_argument("--out", required=True)
  p.add_argument("--batch", type=int, default=None)
  p.add_argument("--platforms", default=None,
                 help="comma-separated lowering targets, e.g. tpu,cpu")
  p.add_argument("--devices", type=int, default=1,
                 help="export a GSPMD program sharding the sample batch "
                 "over this many devices (serving host must match)")
  p.add_argument("--cpu", action="store_true",
                 help="pin jax to host CPU (no TPU device op)")
  args = p.parse_args(argv)

  import jax
  if args.cpu:
    jax.config.update("jax_platforms", "cpu")
    if args.devices > 1:  # virtual CPU mesh for multi-device lowering
      jax.config.update("jax_num_cpu_devices", args.devices)

  from soft_truncation_tpu.losses import get_optimizer
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.serve import (artifact_meta, export_sampler,
                                         save_artifact, save_params_npz)
  from soft_truncation_tpu.train import CheckpointManager, init_train_state

  config = _load_config(args.config)

  model = create_model(config)
  step = 0
  ckpt = None
  if args.workdir:
    ckpt = CheckpointManager(args.workdir)
    if not os.path.exists(ckpt.meta_path):
      raise SystemExit(f"no checkpoint under {args.workdir}")
  state = init_train_state(jax.random.PRNGKey(config.seed), config, model,
                           get_optimizer(config),
                           abstract=ckpt is not None)
  if ckpt is not None:
    state = ckpt.restore_meta(state)
    step = int(state.step)
    params = state.ema_params
  else:
    print("WARNING: no --workdir; exporting RANDOM-INIT weights "
          "(smoke tests only)", file=sys.stderr)
    params = state.params

  platforms = args.platforms.split(",") if args.platforms else None
  mesh = None
  if args.devices > 1:
    from soft_truncation_tpu.parallel import make_mesh
    if len(jax.devices()) < args.devices:
      raise SystemExit(f"--devices {args.devices} but only "
                       f"{len(jax.devices())} visible")
    mesh = make_mesh(devices=jax.devices()[:args.devices])
  exported, shape = export_sampler(config, params, batch=args.batch,
                                   platforms=platforms, mesh=mesh)
  meta = artifact_meta(config, shape, exported)
  meta["checkpoint_step"] = step
  save_artifact(exported, meta, args.out + ".stsrv")
  save_params_npz(params, args.out + ".params.npz")
  print(f"wrote {args.out}.stsrv ({os.path.getsize(args.out + '.stsrv')} "
        f"bytes) + {args.out}.params.npz  [step {step}, "
        f"platforms {meta['platforms']}]")


if __name__ == "__main__":
  main()
