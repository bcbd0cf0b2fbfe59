"""AOT export of the sampling program for production serving.

Beyond-parity capability (the reference has no deployment story: serving
samples means keeping the full training Python stack alive — configs,
model zoo, sampler factories; its only compiled-artifact precedent is
consuming NVIDIA's torchscript Inception, cleanfid/features.py:13). On
TPU the natural deployment unit is the compiled XLA program itself:
:mod:`jax.export` serializes the lowered StableHLO together with its
calling convention, so a serving host replays the sampler with nothing
but jax + this artifact + a params file — no Flax modules, no config
system, no sampler registries on the deployment image. Artifacts can be
lowered for platforms the exporting host does not have (export on a CPU
dev box, serve on TPU), and one artifact serves every checkpoint with
the same parameter tree.

Artifact = one self-contained file::

    STSRV001 | u32 meta-length | meta JSON (utf-8) | StableHLO payload

The exported callable is ``fn(params, key) -> (samples_uint8, nfe)``
with samples NHWC in [0, 255] (uint8 on device: 4x smaller fetches, the
same truncation semantics as the eval pipeline's shard writer,
eval/sampling_io.py).
"""

from __future__ import annotations

import json
import struct
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as jax_export

from ..data import get_data_inverse_scaler
from ..eval.sampling_io import _to_uint8
from ..models import create_model
from ..sample import get_sampling_fn
from ..sde import get_sde

_MAGIC = b"STSRV001"


def make_serving_fn(config, batch: Optional[int] = None):
  """Build the jitted serving function for ``config``.

  Returns ``(model, fn, shape)`` where ``fn(params, key) ->
  (samples_uint8, nfe)`` and ``shape`` is the NHWC sample shape. The
  model module is closed over (it is static); only the parameter pytree
  and the PRNG key remain as runtime inputs — exactly the calling
  convention a serving host wants.

  Self-jitting samplers (``sampling.chunk > 0`` Picard) partition the
  chain into several device programs and cannot be captured as ONE
  exported computation — rejected explicitly rather than silently
  exporting an unbounded single dispatch.
  """
  rng_impl = config.tpu.get("rng_impl", None) if "tpu" in config else None
  if rng_impl:  # same key-impl plumbing as run_lib._build_everything
    jax.config.update("jax_default_prng_impl", rng_impl)
  shape = (int(batch or config.sampling.batch_size),
           config.data.image_size, config.data.image_size,
           config.data.num_channels)
  sde = get_sde(config)
  model = create_model(config)
  sampling_fn = get_sampling_fn(config, sde, shape,
                                get_data_inverse_scaler(config),
                                config.sampling.truncation_time)
  if getattr(sampling_fn, "self_jitting", False):
    raise ValueError(
        "sampler partitions itself into multiple device programs "
        "(sampling.chunk > 0) and cannot be AOT-exported as one "
        "computation; export with sampling.chunk=0")

  @jax.jit
  def fn(params, key):
    samples, nfe = sampling_fn(model, params, key)
    return _to_uint8(samples), nfe

  return model, fn, shape


def export_sampler(config, params,
                   batch: Optional[int] = None,
                   platforms: Optional[Sequence[str]] = None,
                   mesh=None
                   ) -> Tuple[jax_export.Exported, Tuple[int, ...]]:
  """AOT-lower the configured sampler to a serializable Exported.

  Returns ``(exported, shape)`` — the NHWC sample shape is authoritative
  here (callers feed it to :func:`artifact_meta` rather than re-deriving
  it). ``platforms`` lowers for targets the exporting host may not have
  (e.g. ``("tpu", "cpu")`` from a CPU dev box); None = current backend.
  ``params`` only contributes shapes/dtypes — weights stay external so
  the artifact is checkpoint-independent.

  ``mesh`` exports a MULTI-DEVICE program: params/key replicated, the
  sample batch GSPMD-sharded over the mesh's 'data' axis (jax.export
  records the shardings and device count; the serving host replays it on
  the same number of devices — SamplingService handles placement). The
  batch must divide the mesh size.
  """
  _, fn, shape = make_serving_fn(config, batch=batch)
  if mesh is not None:
    from ..parallel import batch_sharding, replicated_sharding
    if shape[0] % mesh.devices.size:
      raise ValueError(f"batch {shape[0]} must divide the mesh size "
                       f"{mesh.devices.size}")
    rs = replicated_sharding(mesh)
    fn = jax.jit(fn, in_shardings=(rs, rs),
                 out_shardings=(batch_sharding(mesh), rs))
  param_specs = jax.tree.map(
      lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), params)
  # key layout depends on jax_default_prng_impl (threefry (2,), rbg (4,));
  # eval_shape derives it without a device op (wedged-tunnel safe); the
  # fresh lambda matters: jax's trace cache does NOT key on
  # jax_default_prng_impl, so eval_shape(jax.random.PRNGKey, ...) would
  # return a stale spec after an impl switch
  key_spec = jax.eval_shape(lambda s: jax.random.PRNGKey(s), 0)
  kwargs = {"platforms": tuple(platforms)} if platforms else {}
  return jax_export.export(fn, **kwargs)(param_specs, key_spec), shape


def artifact_meta(config, shape, exported: jax_export.Exported
                  ) -> Dict[str, Any]:
  """Provenance header stored alongside the program."""
  return {
      "model_name": config.model.name,
      "sde": config.training.sde,
      "sampling_method": config.sampling.method,
      "sample_shape": list(shape),
      "platforms": list(exported.platforms),
      # the exported key_spec layout depends on this; the server must
      # build request keys under the SAME impl (threefry (2,) vs rbg (4,))
      "rng_impl": str(jax.config.jax_default_prng_impl),
      # >1 for GSPMD-sharded programs: the serving host must replay on
      # exactly this many devices (SamplingService builds the mesh)
      "num_devices": int(exported.nr_devices),
      "jax_version": jax.__version__,
      "output": "uint8 NHWC in [0,255] + traced nfe scalar",
  }


def save_artifact(exported: jax_export.Exported, meta: Dict[str, Any],
                  path: str) -> None:
  """Write the single-file artifact (see module docstring for layout)."""
  meta_bytes = json.dumps(meta, sort_keys=True).encode("utf-8")
  payload = bytes(exported.serialize())
  with open(path, "wb") as f:
    f.write(_MAGIC)
    f.write(struct.pack(">I", len(meta_bytes)))
    f.write(meta_bytes)
    f.write(payload)


def load_artifact(path: str) -> Tuple[jax_export.Exported, Dict[str, Any]]:
  """Read an artifact file back to ``(Exported, meta)``.

  ``Exported.call(params, key)`` replays the program (trace into an
  outer jit or call eagerly)."""
  with open(path, "rb") as f:
    magic = f.read(len(_MAGIC))
    if magic != _MAGIC:
      raise ValueError(f"{path}: not a soft_truncation_tpu serving "
                       f"artifact (bad magic {magic!r})")
    (meta_len,) = struct.unpack(">I", f.read(4))
    meta = json.loads(f.read(meta_len).decode("utf-8"))
    payload = f.read()
  return jax_export.deserialize(bytearray(payload)), meta


# npz cannot represent ml_dtypes extended dtypes (bfloat16/fp8 round-trip
# as raw void '|V2'); store those as same-width uints + a dtype manifest
_DTYPES_KEY = "__dtypes__"
_UINT_OF_WIDTH = {1: np.uint8, 2: np.uint16, 4: np.uint32}


def save_params_npz(params, path: str) -> None:
  """Flatten the parameter pytree to a path-keyed npz so a serving host
  can reload it without the Flax module that defined it. Extended dtypes
  (bfloat16 EMA shadows, fp8) are bit-cast to uints and recorded in a
  dtype manifest entry so they survive the npz format."""
  flat, ext_dtypes = {}, {}
  for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
    name = "/".join(
        k.key if hasattr(k, "key") else str(k.idx) for k in kp)
    if name == _DTYPES_KEY:
      raise ValueError(f"parameter path collides with the reserved "
                       f"manifest key {_DTYPES_KEY!r}")
    a = np.asarray(leaf)
    if a.dtype.kind == "V":  # ml_dtypes extension (bfloat16, float8_*)
      ext_dtypes[name] = a.dtype.name
      a = a.view(_UINT_OF_WIDTH[a.dtype.itemsize])
    flat[name] = a
  flat[_DTYPES_KEY] = np.frombuffer(
      json.dumps(ext_dtypes, sort_keys=True).encode("utf-8"), np.uint8)
  np.savez(path, **flat)


def load_params_npz(path: str):
  """Rebuild the nested-dict parameter pytree from a params npz."""
  params: Dict[str, Any] = {}
  with np.load(path) as f:
    ext_dtypes = (json.loads(bytes(f[_DTYPES_KEY]).decode("utf-8"))
                  if _DTYPES_KEY in f.files else {})
    for name in f.files:
      if name == _DTYPES_KEY:
        continue
      node = params
      keys = name.split("/")
      for k in keys[:-1]:
        node = node.setdefault(k, {})
      leaf = f[name]
      if name in ext_dtypes:  # np.dtype resolves ml_dtypes names
        leaf = leaf.view(np.dtype(ext_dtypes[name]))
      node[keys[-1]] = leaf
  return params
