"""Multi-host simulation: 2 jax.distributed CPU processes (2 devices each)
exercising per-host data sharding + a data-parallel train step over the
global 4-device mesh (SURVEY.md §4 item 5; reference has no multi-host
support at all — this is the pod-readiness check for the rebuild)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
  s = socket.socket()
  s.bind(("localhost", 0))
  port = s.getsockname()[1]
  s.close()
  return port


def _run_pair(tmp_path, phase: str, expect: str):
  """Spawn a 2-process jax.distributed CPU cluster running one phase."""
  worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
  coord = f"localhost:{_free_port()}"
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  env.pop("XLA_FLAGS", None)
  env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(worker))
                       + os.pathsep + env.get("PYTHONPATH", ""))

  procs = [
      subprocess.Popen(
          [sys.executable, worker, coord, "2", str(i), str(tmp_path),
           phase],
          env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
          text=True)
      for i in range(2)
  ]
  outs = [p.communicate(timeout=420)[0] for p in procs]
  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    assert expect in out, out[-2000:]
  return outs


def test_two_host_data_sharding_and_global_step(tmp_path):
  # bounded by communicate(timeout=420) in _run_pair
  _run_pair(tmp_path, "data", "global step ok")

  fp = []
  for i in range(2):
    with open(tmp_path / f"fingerprint_{i}.txt") as f:
      fp.append(set(f.read().split()))
  assert fp[0] and fp[1]
  # per-host ds.shard must give disjoint data slices
  assert not (fp[0] & fp[1]), f"{len(fp[0] & fp[1])} shared images"


def test_two_host_checkpoint_save_restore_resume(tmp_path):
  """The reference's one fault-tolerance feature — preemption checkpoints
  (utils.py:13-36, run_lib.py:82-83) — proven under jax.distributed:
  a 2-process cluster saves the rolling Orbax checkpoint, the cluster is
  torn down, a FRESH 2-process cluster restores it and keeps stepping."""
  _run_pair(tmp_path, "ckpt_save", "ckpt save ok")
  assert (tmp_path / "workdir" / "checkpoints-meta" / "checkpoint").exists()
  _run_pair(tmp_path, "ckpt_resume", "ckpt resume ok")
