"""Serving stack tests (soft_truncation_tpu/serve/).

The load-bearing properties: (1) the AOT artifact replays the SAME
program — deserialize(serialize(export)) reproduces the direct jitted
sampler bit-for-bit (uint8 equality); (2) the artifact pair is
self-sufficient — the HTTP server answers sampling requests from
(artifact, params npz) alone, deterministically per seed; (3) the
cross-platform story lowers for a TPU this host does not have.

Beyond parity: the reference has no deployment/serving path at all.
"""

import json
import struct
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.serve import (artifact_meta, export_sampler,
                                       load_artifact, load_params_npz,
                                       make_serving_fn, make_server,
                                       save_artifact, save_params_npz)
from soft_truncation_tpu.serve.export import _MAGIC

# tiny model/sampler overrides shared with the generated CLI config (all
# literals so the CLI test can embed repr() of this dict in a config file)
TINY = {
    "training": dict(sde="vesde", continuous=True, eta=1e-6,
                     truncation_time=1e-3),
    "data": dict(image_size=8, centered=False),
    "sampling": dict(method="dpm_solver", dpm_steps=4, noise_removal=True,
                     batch_size=2),
    "model": dict(
        name="ncsnpp", scale_by_sigma=True, ema_rate=0.999,
        normalization="GroupNorm", nonlinearity="swish", nf=8,
        ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,),
        resamp_with_conv=True, conditional=True, fir=False,
        fir_kernel=[1, 3, 3, 1], skip_rescale=True, resblock_type="biggan",
        progressive="none", progressive_input="none",
        progressive_combine="sum", init_scale=0.0,
        embedding_type="fourier", fourier_scale=16, num_scales=6),
}


def _config(**sampling_overrides):
  config = default_config("cifar10")
  override(config, TINY)
  for k, v in sampling_overrides.items():
    setattr(config.sampling, k, v)
  return config


def _params(config):
  model = create_model(config)
  x = np.zeros((2, 8, 8, 3), np.float32)
  t = np.full((2,), 1.0, np.float32)
  return model.init({"params": jax.random.PRNGKey(0)}, x, t,
                    train=False)["params"]


def _roundtrip(exported):
  from jax import export as jax_export
  return jax_export.deserialize(exported.serialize())


@pytest.mark.fast
@pytest.mark.parametrize("method", ["dpm_solver", "pc"])
def test_export_roundtrip_matches_direct(method):
  config = _config(method=method)
  if method == "pc":
    config.sampling.predictor = "reverse_diffusion"
    config.sampling.corrector = "langevin"
    config.sampling.snr = 0.16
    config.sampling.n_steps_each = 1
    config.model.num_scales = 6
  params = _params(config)
  _, fn, shape = make_serving_fn(config)
  key = jax.random.PRNGKey(3)
  want_samples, want_nfe = fn(params, key)

  exported, got_shape = export_sampler(config, params)
  assert got_shape == shape
  got_samples, got_nfe = _roundtrip(exported).call(params, key)

  assert want_samples.dtype == np.uint8 and want_samples.shape == shape
  np.testing.assert_array_equal(np.asarray(want_samples),
                                np.asarray(got_samples))
  assert int(want_nfe) == int(got_nfe)


def test_chunked_picard_rejected():
  # chunk < num_scales so the chunked (self-jitting) path is actually taken
  config = _config(method="picard", chunk=2)
  # exact mode so the stochastic-chain tol guard doesn't fire first —
  # this test pins the chunked-picard (self-jitting) serving rejection
  config.sampling.picard_tol = 0.0
  config.sampling.predictor = "reverse_diffusion"
  config.sampling.corrector = "none"
  config.sampling.snr = 0.16
  config.sampling.n_steps_each = 1
  with pytest.raises(ValueError, match="chunk"):
    make_serving_fn(config)


@pytest.mark.fast
def test_artifact_file_roundtrip(tmp_path):
  config = _config()
  params = _params(config)
  exported, shape = export_sampler(config, params)
  assert shape == (2, 8, 8, 3)
  meta = artifact_meta(config, shape, exported)
  path = str(tmp_path / "a.stsrv")
  save_artifact(exported, meta, path)

  loaded, got_meta = load_artifact(path)
  assert got_meta["sample_shape"] == [2, 8, 8, 3]
  assert got_meta["sampling_method"] == "dpm_solver"
  assert got_meta["model_name"] == "ncsnpp"
  key = jax.random.PRNGKey(1)
  _, fn, _ = make_serving_fn(config)
  np.testing.assert_array_equal(np.asarray(fn(params, key)[0]),
                                np.asarray(loaded.call(params, key)[0]))


def test_artifact_bad_magic(tmp_path):
  path = str(tmp_path / "bad.stsrv")
  with open(path, "wb") as f:
    f.write(b"NOTSTSRV" + struct.pack(">I", 2) + b"{}")
  with pytest.raises(ValueError, match="bad magic"):
    load_artifact(path)


@pytest.mark.fast
def test_params_npz_roundtrip(tmp_path):
  config = _config()
  params = _params(config)
  path = str(tmp_path / "p.npz")
  save_params_npz(params, path)
  got = load_params_npz(path)
  assert (jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
          == jax.tree_util.tree_structure(got))
  for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got)):
    np.testing.assert_array_equal(np.asarray(a), b)


@pytest.mark.fast
def test_params_npz_roundtrip_bfloat16(tmp_path):
  """Extended dtypes survive the npz (naive np.savez turns bfloat16 into
  raw '|V2' void — the tpu.ema_dtype='bfloat16' deployment case)."""
  import ml_dtypes
  params = {
      "dense": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)
                .astype(ml_dtypes.bfloat16),
                "bias": np.ones((4,), np.float32)},
      "f8": np.linspace(-1, 1, 8).astype(ml_dtypes.float8_e4m3fn),
  }
  path = str(tmp_path / "p.npz")
  save_params_npz(params, path)
  got = load_params_npz(path)
  assert got["dense"]["kernel"].dtype == ml_dtypes.bfloat16
  assert got["dense"]["bias"].dtype == np.float32
  assert got["f8"].dtype == ml_dtypes.float8_e4m3fn
  for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got)):
    np.testing.assert_array_equal(a, b)


@pytest.mark.fast
def test_rng_impl_recorded_and_served(tmp_path):
  """An artifact exported under a non-default PRNG impl (rbg keys are
  (4,) uint32, not threefry's (2,)) must be served with matching request
  keys — meta records the impl and SamplingService applies it."""
  from soft_truncation_tpu.serve.server import SamplingService
  default_impl = str(jax.config.jax_default_prng_impl)
  config = _config()
  config.tpu.rng_impl = "rbg"
  params = _params(config)
  try:
    exported, shape = export_sampler(config, params)
    meta = artifact_meta(config, shape, exported)
    assert meta["rng_impl"] == "rbg"
    # a fresh serving host starts on the default impl; the service must
    # recover the exported key convention from meta alone
    jax.config.update("jax_default_prng_impl", default_impl)
    service = SamplingService(exported, params, meta)
    samples, nfe = service.sample(3, seed=7)
    assert samples.shape == (3, 8, 8, 3) and samples.dtype == np.uint8
    assert nfe > 0
  finally:
    jax.config.update("jax_default_prng_impl", default_impl)


@pytest.mark.fast
def test_sharded_export_replays_on_mesh(tmp_path):
  """A mesh export records the GSPMD program (nr_devices=8, batch
  sharded over 'data'); SamplingService rebuilds the mesh from the
  artifact alone and the sharded replay is bit-identical to the
  single-device artifact (threefry values are sharding-invariant)."""
  from soft_truncation_tpu.parallel import make_mesh
  from soft_truncation_tpu.serve.server import SamplingService

  config = _config(batch_size=16)
  params = _params(config)
  mesh = make_mesh()
  assert mesh.devices.size == 8  # conftest's virtual CPU mesh

  exported, shape = export_sampler(config, params, mesh=mesh)
  assert exported.nr_devices == 8
  meta = artifact_meta(config, shape, exported)
  assert meta["num_devices"] == 8

  # round-trip through the file format like a real serving host
  artifact = str(tmp_path / "sharded.stsrv")
  params_path = str(tmp_path / "p.npz")
  save_artifact(exported, meta, artifact)
  save_params_npz(params, params_path)
  loaded, got_meta = load_artifact(artifact)
  service = SamplingService(loaded, load_params_npz(params_path), got_meta)
  got, nfe = service.sample(16, seed=3)
  assert got.shape == (16, 8, 8, 3) and nfe > 0

  exported1, _ = export_sampler(config, params)
  service1 = SamplingService(exported1, params, artifact_meta(
      config, shape, exported1))
  want, _ = service1.sample(16, seed=3)
  np.testing.assert_array_equal(want, got)


def test_cross_platform_lowering_includes_tpu():
  """Export on this CPU host for a TPU it does not have: the multi-
  platform artifact must serialize, deserialize, and still execute on
  the CPU leg."""
  config = _config()
  params = _params(config)
  exported, _ = export_sampler(config, params, platforms=("tpu", "cpu"))
  assert set(exported.platforms) == {"tpu", "cpu"}
  loaded = _roundtrip(exported)
  samples, _ = loaded.call(params, jax.random.PRNGKey(0))
  assert np.asarray(samples).shape == (2, 8, 8, 3)


# ---------------------------------------------------------------------------
# HTTP server
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def serving_pair(tmp_path_factory):
  tmp = tmp_path_factory.mktemp("serve")
  config = _config()
  params = _params(config)
  exported, shape = export_sampler(config, params)
  meta = artifact_meta(config, shape, exported)
  artifact = str(tmp / "a.stsrv")
  params_path = str(tmp / "p.npz")
  save_artifact(exported, meta, artifact)
  save_params_npz(params, params_path)
  return artifact, params_path


@pytest.fixture(scope="module")
def server(serving_pair):
  artifact, params_path = serving_pair
  srv = make_server(artifact, params_path, host="127.0.0.1", port=0)
  t = threading.Thread(target=srv.serve_forever, daemon=True)
  t.start()
  yield f"http://127.0.0.1:{srv.server_address[1]}"
  srv.shutdown()


def _post(url, body):
  req = urllib.request.Request(url, data=json.dumps(body).encode(),
                               headers={"Content-Type": "application/json"})
  with urllib.request.urlopen(req, timeout=120) as r:
    return r.read(), r.headers.get("Content-Type")


@pytest.mark.fast
def test_server_healthz_and_npz_sampling(server):
  with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
    health = json.loads(r.read())
  assert health["status"] == "ok"
  assert health["meta"]["sample_shape"] == [2, 8, 8, 3]

  # num=3 > batch=2 exercises the multi-replay path + final slice
  body, ctype = _post(server + "/sample", {"num": 3, "seed": 5})
  assert ctype == "application/octet-stream"
  import io
  with np.load(io.BytesIO(body)) as f:
    samples, nfe = f["samples"], int(f["nfe"])
  assert samples.shape == (3, 8, 8, 3) and samples.dtype == np.uint8
  assert nfe > 0

  body2, _ = _post(server + "/sample", {"num": 3, "seed": 5})
  assert body2 == body  # deterministic per seed
  body3, _ = _post(server + "/sample", {"num": 3, "seed": 6})
  assert body3 != body  # seed actually matters


def test_server_png_and_errors(server):
  body, ctype = _post(server + "/sample",
                      {"num": 2, "seed": 0, "format": "png"})
  assert ctype == "image/png" and body[:8] == b"\x89PNG\r\n\x1a\n"

  # every malformed request gets a 400 JSON reply, never a dropped
  # connection: zero/huge num, bad format, non-int num, JSON-null num
  # (TypeError path), and a valid-JSON-but-not-an-object body
  for bad in ({"num": 0}, {"num": 10**9}, {"format": "gif"},
              {"num": "xyz"}, {"num": None}, [1, 2]):
    req = urllib.request.Request(
        server + "/sample", data=json.dumps(bad).encode(),
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
      urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400, bad
    assert "error" in json.loads(e.value.read())

  with pytest.raises(urllib.error.HTTPError) as e:
    urllib.request.urlopen(server + "/nope", timeout=30)
  assert e.value.code == 404


def test_server_runtime_failure_returns_500():
  """A sampler runtime failure must produce an HTTP 500 reply, not a
  dead connection (stub service, no artifact needed)."""
  from http.server import ThreadingHTTPServer
  from soft_truncation_tpu.serve.server import _make_handler

  class Boom:
    meta = {"sample_shape": [2, 8, 8, 3]}
    batch = 2

    def sample(self, num, seed):
      raise RuntimeError("device exploded")

  srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(Boom()))
  t = threading.Thread(target=srv.serve_forever, daemon=True)
  t.start()
  try:
    url = f"http://127.0.0.1:{srv.server_address[1]}/sample"
    req = urllib.request.Request(
        url, data=b"{}", headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
      urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 500
    assert "device exploded" in json.loads(e.value.read())["error"]
  finally:
    srv.shutdown()


def _write_tiny_config(tmp_path):
  cfg_file = tmp_path / "tiny_config.py"
  cfg_file.write_text(
      "from soft_truncation_tpu.configs.base import default_config, "
      "override\n"
      f"TINY = {TINY!r}\n"
      "def get_config():\n"
      "  config = default_config('cifar10')\n"
      "  override(config, TINY)\n"
      "  return config\n")
  return cfg_file


def _cli():
  import os
  import sys
  sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
  import export_sampler as cli
  return cli


def test_cli_exporter_random_init(tmp_path):
  """tools/export_sampler.py end to end (random-init path, --cpu)."""
  cfg_file = _write_tiny_config(tmp_path)
  out = str(tmp_path / "artifact")
  _cli().main(["--config", str(cfg_file), "--out", out, "--cpu"])

  loaded, meta = load_artifact(out + ".stsrv")
  params = load_params_npz(out + ".params.npz")
  assert meta["checkpoint_step"] == 0
  samples, _ = loaded.call(params, jax.random.PRNGKey(0))
  assert np.asarray(samples).shape == tuple(meta["sample_shape"])


def test_cli_exporter_restores_ema_checkpoint(tmp_path):
  """--workdir exports the restored EMA weights, not random init: the
  production path (abstract template -> restore_meta -> ema_params)."""
  from soft_truncation_tpu.losses import get_optimizer
  from soft_truncation_tpu.train import CheckpointManager, init_train_state

  cfg_file = _write_tiny_config(tmp_path)
  config = _config()
  model = create_model(config)
  state = init_train_state(jax.random.PRNGKey(1), config, model,
                           get_optimizer(config))
  # recognizable EMA (≠ params) at a nonzero step
  state = state.replace(
      step=jax.numpy.asarray(7, state.step.dtype),
      ema_params=jax.tree.map(lambda a: a + 0.125, state.params))
  workdir = str(tmp_path / "work")
  CheckpointManager(workdir).save_meta(state)

  out = str(tmp_path / "trained")
  _cli().main(["--config", str(cfg_file), "--out", out,
               "--workdir", workdir, "--cpu"])

  loaded, meta = load_artifact(out + ".stsrv")
  got = load_params_npz(out + ".params.npz")
  assert meta["checkpoint_step"] == 7
  for a, b in zip(jax.tree.leaves(state.ema_params), jax.tree.leaves(got)):
    np.testing.assert_array_equal(np.asarray(a), b)
  # and the artifact actually runs with the restored weights
  samples, _ = loaded.call(got, jax.random.PRNGKey(0))
  assert np.asarray(samples).shape == tuple(meta["sample_shape"])
