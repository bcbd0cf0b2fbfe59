"""Minimal production sampling server over an AOT-exported artifact.

The deployment unit is ``(artifact.stsrv, params.npz)`` from
:mod:`.export` — the serving host needs jax + numpy + PIL, not the model
zoo, config system, or sampler factories. Stdlib ``http.server`` keeps
the image dependency-free; the device is single-tenant (one XLA program
at a time), so requests serialize on a lock — batching happens inside
the exported program (its static batch), and a request for ``num``
samples runs ``ceil(num / batch)`` program replays.

Endpoints::

    GET  /healthz            -> 200 {"status": "ok", "meta": {...}}
    POST /sample             -> body {"num": int, "seed": int,
                                      "format": "npz" | "png"}
        npz: application/octet-stream, np.savez{"samples": uint8 NHWC,
             "nfe": int}
        png: image/png grid (up to 64 images)

Determinism: the same ``seed`` always returns the same samples — request
round r uses fold_in(PRNGKey(seed), r), the same key discipline as the
eval pipeline's shard loop (run_lib.py).

Run: ``python -m soft_truncation_tpu.serve.server --artifact a.stsrv
--params p.npz --port 8000`` (see tools/export_sampler.py for producing
the pair).
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Tuple

import jax
import numpy as np

from .export import load_artifact, load_params_npz

log = logging.getLogger(__name__)


class SamplingService:
  """Replay an exported sampler; thread-safe, deterministic per seed.

  ``max_num`` bounds one request's work: the device lock is held for
  ``ceil(num / batch)`` sequential program replays and every replay's
  samples are buffered on the host, so an unbounded ``num`` would let a
  single request wedge the single-tenant device and OOM the host."""

  def __init__(self, exported, params, meta: Dict[str, Any],
               max_num: int = 4096):
    # the artifact's key calling convention was fixed at export time
    # (threefry (2,) vs rbg (4,) uint32) — apply the recorded impl so
    # PRNGKey/fold_in below produce matching keys
    if meta.get("rng_impl"):
      jax.config.update("jax_default_prng_impl", meta["rng_impl"])
    self._call = jax.jit(exported.call)  # one trace, cached thereafter
    self.meta = dict(meta)
    self.batch = int(meta["sample_shape"][0])
    self.max_num = int(max_num)
    self._lock = threading.Lock()  # single-tenant device
    # GSPMD artifact: replay needs a device context spanning exactly the
    # exported device count — replicate params/key over a data mesh
    nr = int(getattr(exported, "nr_devices", 1))
    self._replicated = None
    if nr > 1:
      if len(jax.devices()) < nr:
        raise ValueError(
            f"artifact was exported for {nr} devices; this host has "
            f"{len(jax.devices())}")
      from ..parallel import make_mesh, replicated_sharding
      mesh = make_mesh(devices=jax.devices()[:nr])
      self._replicated = replicated_sharding(mesh)
      params = jax.device_put(params, self._replicated)
    self._params = params

  def sample(self, num: int, seed: int) -> Tuple[np.ndarray, int]:
    """``num`` uint8 NHWC samples and the total measured NFE."""
    if not 0 < num <= self.max_num:
      raise ValueError(
          f"num must be in [1, {self.max_num}], got {num}")
    base = jax.random.PRNGKey(seed)
    chunks, nfe = [], 0
    with self._lock:
      for r in range((num + self.batch - 1) // self.batch):
        key = jax.random.fold_in(base, r)
        if self._replicated is not None:
          key = jax.device_put(key, self._replicated)
        samples, n = self._call(self._params, key)
        chunks.append(np.asarray(samples))
        nfe += int(n)
    return np.concatenate(chunks, axis=0)[:num], nfe


def _make_handler(service: SamplingService):

  class Handler(BaseHTTPRequestHandler):

    def log_message(self, fmt, *args):  # route to logging, not stderr
      log.info("%s - %s", self.address_string(), fmt % args)

    def _reply(self, code: int, body: bytes, ctype: str):
      self.send_response(code)
      self.send_header("Content-Type", ctype)
      self.send_header("Content-Length", str(len(body)))
      self.end_headers()
      self.wfile.write(body)

    def _reply_json(self, code: int, obj):
      self._reply(code, json.dumps(obj).encode("utf-8"),
                  "application/json")

    def do_GET(self):
      if self.path == "/healthz":
        self._reply_json(200, {"status": "ok", "meta": service.meta})
      else:
        self._reply_json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
      if self.path != "/sample":
        self._reply_json(404, {"error": f"unknown path {self.path}"})
        return
      try:
        length = int(self.headers.get("Content-Length", 0))
        req = json.loads(self.rfile.read(length) or b"{}")
        if not isinstance(req, dict):
          raise ValueError(f"request body must be a JSON object, "
                           f"got {type(req).__name__}")
        num = int(req.get("num", service.batch))
        seed = int(req.get("seed", 0))
        fmt = str(req.get("format", "npz")).lower()
        if fmt not in ("npz", "png"):
          raise ValueError(f"format must be npz or png, got {fmt!r}")
      except (ValueError, KeyError, TypeError,
              json.JSONDecodeError) as e:  # int(None) raises TypeError
        self._reply_json(400, {"error": str(e)})
        return
      try:
        samples, nfe = service.sample(num, seed)
      except ValueError as e:  # request out of bounds
        self._reply_json(400, {"error": str(e)})
        return
      except Exception as e:  # sampler runtime failure — still reply
        log.exception("sampling failed")
        self._reply_json(500, {"error": f"sampling failed: {e}"})
        return
      buf = io.BytesIO()
      if fmt == "npz":
        np.savez_compressed(buf, samples=samples, nfe=np.asarray(nfe))
        self._reply(200, buf.getvalue(), "application/octet-stream")
      else:
        from ..eval.sampling_io import save_image_grid
        save_image_grid(samples, buf, format="PNG")
        self._reply(200, buf.getvalue(), "image/png")

  return Handler


def make_server(artifact_path: str, params_path: str, host: str = "0.0.0.0",
                port: int = 8000, max_num: int = 4096) -> ThreadingHTTPServer:
  """Load the artifact pair and bind the HTTP server (``port=0`` picks a
  free port; call ``serve_forever()`` to run)."""
  exported, meta = load_artifact(artifact_path)
  params = load_params_npz(params_path)
  service = SamplingService(exported, params, meta, max_num=max_num)
  return ThreadingHTTPServer((host, port), _make_handler(service))


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
  p.add_argument("--artifact", required=True)
  p.add_argument("--params", required=True)
  p.add_argument("--host", default="0.0.0.0")
  p.add_argument("--port", type=int, default=8000)
  p.add_argument("--max-num", type=int, default=4096,
                 help="per-request sample-count cap")
  p.add_argument("--cpu", action="store_true",
                 help="pin jax to host CPU before any device op")
  args = p.parse_args(argv)
  if args.cpu:
    jax.config.update("jax_platforms", "cpu")
    # multi-device artifacts need that many devices BEFORE backend init;
    # peeking at the meta header is pure file I/O
    nr = int(load_artifact(args.artifact)[1].get("num_devices", 1))
    if nr > 1:
      jax.config.update("jax_num_cpu_devices", nr)
  logging.basicConfig(level=logging.INFO)
  srv = make_server(args.artifact, args.params, args.host, args.port,
                    max_num=args.max_num)
  log.info("serving on %s:%d", *srv.server_address)
  try:
    srv.serve_forever()
  except KeyboardInterrupt:
    srv.shutdown()


if __name__ == "__main__":
  main()
