"""Converter + Flax InceptionV3 forward parity vs an independent torch
oracle of the pytorch-FID Inception variant (reference
cleanfid/inception_pytorch.py:218-325), built with seeded random weights
at test time — no network, no stored blob. Covers: OIHW->HWIO kernel
transpose, BN scale/bias/running-stat mapping (eps=1e-3), FID pooling
patches (count_include_pad=False avg; Mixed_7c max), fc mapping, and the
[0,255] input normalization."""

import os
import sys
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def oracle():
  from make_inception_goldens import build_random_oracle
  return build_random_oracle(seed=0)


def test_converter_and_flax_forward_match_torch(oracle):
  from make_inception_goldens import oracle_forward
  from convert_inception_weights import convert
  from soft_truncation_tpu.eval.inception_v3 import (InceptionV3,
                                                     load_params_npz)

  rng = np.random.RandomState(1)
  # 111 px: smallest size giving a 2x2 final grid, so the global average
  # pool is exercised non-trivially (299 would be needlessly slow on CPU)
  x_raw = rng.uniform(0, 255, size=(2, 3, 111, 111)).astype(np.float32)
  feats_t, logits_t = oracle_forward(oracle, x_raw)

  with tempfile.TemporaryDirectory() as tmp:
    npz = os.path.join(tmp, "w.npz")
    convert(oracle.state_dict(), npz)
    params = load_params_npz(npz)

  model = InceptionV3(num_classes=1008)
  x_nhwc = jnp.asarray(np.transpose(x_raw, (0, 2, 3, 1)))
  feats_j, probs_j = model.apply({"params": params}, x_nhwc)

  np.testing.assert_allclose(np.asarray(feats_j), feats_t,
                             rtol=1e-4, atol=1e-4)
  probs_t = torch.softmax(torch.from_numpy(logits_t), dim=1).numpy()
  np.testing.assert_allclose(np.asarray(probs_j), probs_t,
                             rtol=1e-4, atol=1e-6)


def _to_torchscript_layout(sd, keep_gamma=True):
  """Rename a torchvision-layout state dict into the NVIDIA torchscript
  layout (layers.mixed_4.tower.conv_1.bn.bias ...), using the inverses of
  the converter's published tables. Keys absent from the torchscript file
  (AuxLogits, num_batches_tracked, optionally BN gamma) are dropped."""
  from convert_inception_weights import TS_TOP, TS_BRANCH

  top_inv = {v: k for k, v in TS_TOP.items()}
  out = {}
  for key, v in sd.items():
    parts = key.split(".")
    if parts[0] == "AuxLogits" or parts[-1] == "num_batches_tracked":
      continue
    if not keep_gamma and parts[-2:] == ["bn", "weight"]:
      continue  # TF-2015 BN has no scale
    if parts[0] == "fc":
      out["output." + ".".join(parts[1:])] = v
      continue
    top = parts[0]
    leaf = ".".join(parts[-2:])
    if top.startswith("Conv2d"):
      out[f"layers.{top_inv[top]}.{leaf}"] = v
    else:
      branch_inv = {b: m for m, b in TS_BRANCH[top].items()}
      out[f"layers.{top_inv[top]}.{branch_inv[parts[1]]}.{leaf}"] = v
  return out


def test_torchscript_layout_converts_identically(oracle):
  """The NVIDIA torchscript naming (clean-mode default extractor,
  cleanfid/features.py:13-47) must convert to the exact same npz as the
  pytorch-FID naming — forward parity is then inherited from
  test_converter_and_flax_forward_match_torch."""
  from convert_inception_weights import convert

  sd = dict(oracle.state_dict())
  ts_sd = _to_torchscript_layout(sd, keep_gamma=True)
  with tempfile.TemporaryDirectory() as tmp:
    npz_tv, npz_ts = os.path.join(tmp, "tv.npz"), os.path.join(tmp, "ts.npz")
    convert(sd, npz_tv)
    convert(ts_sd, npz_ts)
    tv, ts = np.load(npz_tv), np.load(npz_ts)
    assert set(tv.files) == set(ts.files)
    for name in tv.files:
      np.testing.assert_array_equal(tv[name], ts[name], err_msg=name)


def test_torchscript_layout_without_gamma_fills_ones(oracle):
  """TF-2015 BatchNorms carry no scale; the converter must fill
  bn_scale = 1 so load_params_npz covers every Flax leaf."""
  from convert_inception_weights import convert
  from soft_truncation_tpu.eval.inception_v3 import load_params_npz

  ts_sd = _to_torchscript_layout(dict(oracle.state_dict()),
                                 keep_gamma=False)
  with tempfile.TemporaryDirectory() as tmp:
    npz = os.path.join(tmp, "w.npz")
    convert(ts_sd, npz)
    flat = np.load(npz)
    scales = [n for n in flat.files if n.endswith("bn_scale")]
    assert scales
    for name in scales:
      np.testing.assert_array_equal(flat[name], np.ones_like(flat[name]))
    load_params_npz(npz)  # loads into the nested layout without error


def test_converter_raises_on_unknown_keys():
  from convert_inception_weights import convert

  with tempfile.TemporaryDirectory() as tmp:
    with pytest.raises(ValueError, match="unrecognized torchscript"):
      convert({"layers.bogus.conv.weight": np.zeros((3, 3, 3, 3))},
              os.path.join(tmp, "w.npz"))
    with pytest.raises(ValueError, match="unrecognized weight keys"):
      convert({"something.else.entirely": np.zeros((4,))},
              os.path.join(tmp, "w.npz"))


def test_converter_skips_aux_and_covers_all_params(oracle):
  """Every Flax param leaf must be produced by the converter (no silently
  default-initialized leaves), and AuxLogits keys must be dropped."""
  import jax
  from convert_inception_weights import convert
  from soft_truncation_tpu.eval.inception_v3 import (InceptionV3,
                                                     load_params_npz)

  sd = dict(oracle.state_dict())
  # inject a fake AuxLogits entry like the pytorch-fid checkpoint carries
  sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
  with tempfile.TemporaryDirectory() as tmp:
    npz = os.path.join(tmp, "w.npz")
    convert(sd, npz)
    params = load_params_npz(npz)
  assert "AuxLogits" not in params

  model = InceptionV3(num_classes=1008)
  x = jnp.zeros((1, 75, 75, 3))
  init_params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
  init_paths = {jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(init_params)[0]}
  got_paths = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_flatten_with_path(params)[0]}
  assert init_paths == got_paths, (
      f"missing={sorted(init_paths - got_paths)[:6]} "
      f"extra={sorted(got_paths - init_paths)[:6]}")


def test_device_resize_matches_pil_clean_resize_upscale():
  """The 'device' resize mode (jax.image.resize 'cubic') must match
  cleanfid's PIL bicubic per-channel float32 resize for UPSCALING —
  both are Keys a=-0.5 bicubic at half-pixel coordinates. Tolerance is
  absolute on the raw [0,255] range; 1e-3 is ~4e-6 relative, far below
  FID sensitivity. (Downscaling >= 299px falls back to the host path —
  PIL's antialiased reduction has no exact jax twin.)"""
  import jax
  import jax.numpy as jnp
  import numpy as np
  from soft_truncation_tpu.eval.inception import clean_resize

  rng = np.random.RandomState(0)
  imgs = rng.randint(0, 256, (4, 32, 32, 3)).astype(np.uint8)
  want = clean_resize(imgs, 299)
  got = np.asarray(jax.image.resize(
      jnp.asarray(imgs, jnp.float32), (4, 299, 299, 3), "cubic"))
  np.testing.assert_allclose(got, want, atol=1e-3)


def test_flax_extractor_device_resize_features_close():
  """End-to-end: FlaxInceptionExtractor(resize_mode='device') features
  must match the host-PIL path through a REAL random-init InceptionV3 —
  the resize deviation must not amplify through the network."""
  import os

  import numpy as np
  import pytest

  weights = "workdirs/assets/inception_v3_weights.npz"
  if not os.path.exists(weights):
    pytest.skip("random-init inception npz not generated "
                "(tools/make_random_inception_npz.py)")
  from soft_truncation_tpu.eval.inception import FlaxInceptionExtractor

  rng = np.random.RandomState(1)
  imgs = rng.randint(0, 256, (8, 32, 32, 3)).astype(np.uint8)
  host = FlaxInceptionExtractor(weights, resize_mode="host")
  dev = FlaxInceptionExtractor(weights, resize_mode="device")
  fh, ph = host(imgs)
  fd, pd = dev(imgs)
  scale = np.abs(fh).mean()
  assert np.abs(fh - fd).max() < 1e-2 * max(scale, 1e-6)
  np.testing.assert_allclose(ph, pd, atol=1e-4)


def test_he_rescale_scales_only_convs():
  """tools/make_random_inception_npz.he_rescale must scale 4-D conv
  kernels by the gain and leave BN scales/offsets/fc untouched."""
  from make_random_inception_npz import he_rescale

  flat = {"conv/kernel": np.ones((3, 3, 2, 4), np.float32),
          "bn/scale": np.ones((4,), np.float32),
          "fc/kernel": np.ones((8, 2), np.float32)}
  out = he_rescale(flat, 2.0)
  np.testing.assert_array_equal(out["conv/kernel"], 2.0)
  np.testing.assert_array_equal(out["bn/scale"], 1.0)
  np.testing.assert_array_equal(out["fc/kernel"], 1.0)


def test_random_npz_features_nondegenerate():
  """The shipped random-init npz must produce order-1 pool_3 features.

  Regression for the round-4 metric-curve failure: flax-default
  LeCun-init conv kernels lose ~half the activation variance at every
  conv+ReLU, so through InceptionV3's ~48-deep stack pool_3 collapsed
  to ~2e-4 std — FID sat at numerical noise (~1.6e-4) and IS at exactly
  1.0 for every training snapshot, i.e. the metric could not
  discriminate. He gain (conv kernels ×√2, now the generator default)
  restores std ≈ 0.3 (tools/probe_random_fid.py measurements)."""
  weights = "workdirs/assets/inception_v3_weights.npz"
  if not os.path.exists(weights):
    pytest.skip("random-init inception npz not generated "
                "(tools/make_random_inception_npz.py)")
  from soft_truncation_tpu.eval.inception import FlaxInceptionExtractor

  rng = np.random.RandomState(2)
  imgs = rng.randint(0, 256, (4, 32, 32, 3)).astype(np.uint8)
  ext = FlaxInceptionExtractor(weights, batch_size=4, resize_mode="device")
  feats, probs = ext(imgs)
  assert feats.std() > 1e-2, (
      f"pool_3 features degenerate (std {feats.std():.2e}): the npz was "
      "likely generated without He gain — regenerate with "
      "tools/make_random_inception_npz.py")
  assert probs.std() > 1e-6  # logits must not be exactly uniform either
