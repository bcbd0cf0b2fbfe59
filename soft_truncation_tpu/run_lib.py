"""Training/evaluation pipelines (reference run_lib.py, TPU-native).

One jitted, GSPMD-sharded train step; host loop only feeds data and handles
checkpoints/logging. Per-step host work is one async dispatch — the
reference's per-step ``.cpu()`` loss sync (losses.py:288) becomes a
device->host fetch only on logging steps.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import numpy as np

from . import data as datasets
from .eval import evaluation, sampling_io
from .eval.inception import get_feature_extractor
from .likelihood import get_elbo_fn, get_likelihood_fn
from .losses import get_optimizer
from .models import create_model
from .parallel import (make_mesh, replicated_sharding,
                       stacked_batch_sharding)
from .sample import get_sampling_fn
from .sde import get_sde
from .train import (CheckpointManager, init_train_state, make_eval_loss_step,
                    make_multi_train_step)
from .train.state import param_count

log = logging.getLogger(__name__)


def _crossed(step0: int, last: int, freq: int, allow_zero: bool = False):
  """Largest step label in [step0, last] on the ``freq`` cadence (None
  if the window crosses no multiple). A steps_per_dispatch window covers
  steps step0..last in one dispatch; periodic events (logging,
  snapshots) fire at the window that crosses their nominal step, labeled
  with that step. For a window of width 1 this is exactly the classic
  ``step % freq == 0`` check."""
  if freq <= 0:
    return None
  m = (last // freq) * freq
  if m < step0 or (m == 0 and not allow_zero):
    return None
  return m


def _build_everything(config, workdir, eval_mode: bool = False):
  """Shared setup for train/eval: sde, model, state, fns, checkpoints."""
  rng_impl = config.tpu.get("rng_impl", None) if "tpu" in config else None
  if rng_impl:
    jax.config.update("jax_default_prng_impl", rng_impl)
  sde = get_sde(config)
  model = create_model(config)
  tx = get_optimizer(config)
  ckpt = CheckpointManager(workdir)
  # eval with an existing checkpoint never uses the randomly-initialized
  # values — build the restore template abstractly (no device work,
  # saves ~30-60 s of eval startup on the tunneled runtime)
  abstract = eval_mode and os.path.exists(ckpt.meta_path)
  state = init_train_state(jax.random.PRNGKey(config.seed), config, model,
                           tx, abstract=abstract)
  log.info("model parameters: %d", param_count(state.params))

  restored = ckpt.restore_meta(state)
  if restored is not None:
    state = restored
  else:
    assert not abstract  # abstract template only built when meta exists

  scaler = datasets.get_data_scaler(config)
  inverse_scaler = datasets.get_data_inverse_scaler(config)

  nll_fn = get_likelihood_fn(config, sde, inverse_scaler)
  nelbo_fn = get_elbo_fn(config, sde, inverse_scaler=inverse_scaler)
  sampling_shape = (config.sampling.batch_size, config.data.image_size,
                    config.data.image_size, config.data.num_channels)
  sampling_fn = get_sampling_fn(config, sde, sampling_shape, inverse_scaler,
                                config.sampling.truncation_time)
  # one compilation for all sample shards (model is static, params pytree);
  # chunked samplers (config.sampling.chunk > 0) jit their own segments
  if not getattr(sampling_fn, "self_jitting", False):
    sampling_fn = jax.jit(sampling_fn, static_argnums=0)
  return (sde, model, tx, state, ckpt, scaler, inverse_scaler, nll_fn,
          nelbo_fn, sampling_fn)


def train(config, workdir, assetdir=None):
  """Training pipeline (reference run_lib.py:36-113)."""
  sample_dir = os.path.join(workdir, "samples")
  os.makedirs(sample_dir, exist_ok=True)

  (sde, model, tx, state, ckpt, scaler, inverse_scaler, nll_fn, nelbo_fn,
   sampling_fn) = _build_everything(config, workdir)
  initial_step = int(state.step)

  log.info("loading %s...", config.data.dataset)
  train_ds, eval_ds = datasets.get_dataset(config)
  train_iter = iter(train_ds.as_numpy_iterator())

  mesh = make_mesh(tuple(config.tpu.get("mesh_shape", ())))
  rs = replicated_sharding(mesh)
  sbs = stacked_batch_sharding(mesh)

  # uint8 transport + dequantization + scaling, fused into the train
  # program (shared with tools/bench_e2e_loop.py so the bench replica runs
  # the identical program).
  _preprocess = datasets.make_preprocess_fn(config)

  # K steps per dispatch (config.tpu.steps_per_dispatch): one XLA program
  # trains a [K, B, ...] window, amortizing per-dispatch runtime latency.
  # Any K draws the same per-step randomness (same split chain); K only
  # changes dispatch granularity, not training semantics.
  K = max(int(config.tpu.get("steps_per_dispatch", 1) or 1), 1)
  window_fn = make_multi_train_step(config, sde, model, tx,
                                    preprocess=_preprocess)
  donate = (0,) if config.tpu.get("donate_state", True) else ()
  jitted_window = jax.jit(window_fn, in_shardings=(rs, sbs, rs),
                          out_shardings=(rs, rs, rs),
                          donate_argnums=donate)
  state = jax.device_put(state, rs)

  from .utils.profiling import StepTimer, trace
  timer = StepTimer(config.training.batch_size)
  profile_dir = config.tpu.get("profile_dir", None) if "tpu" in config else None

  # The reference creates workdir/tensorboard but never instantiates a
  # writer (run_lib.py:47-48, dead code); here it is functional.
  tb_writer = None
  try:
    import tensorflow as tf
    tb_dir = os.path.join(workdir, "tensorboard")
    os.makedirs(tb_dir, exist_ok=True)
    tb_writer = tf.summary.create_file_writer(tb_dir)
  except Exception as e:  # tensorboard is observability, never fatal
    log.warning("tensorboard writer unavailable: %s", e)

  key = jax.random.PRNGKey(config.seed)
  n_iters = config.training.n_iters
  log.info("Starting training loop at step %d.", initial_step)
  step0 = initial_step
  while step0 <= n_iters:
    w = min(K, n_iters + 1 - step0)
    raws = []
    for _ in range(w):
      batch, train_iter = datasets.get_batch(config, train_iter, train_ds)
      raws.append(batch)
    batches = jax.device_put(np.stack(raws), sbs)

    state, key, losses = jitted_window(state, batches, key)
    for _ in range(w):
      timer.tick()
    last = step0 + w - 1

    def crossed(freq, allow_zero=False):
      return _crossed(step0, last, freq, allow_zero=allow_zero)

    log_step = crossed(config.training.log_freq, allow_zero=True)
    if log_step is not None:
      losses_np = np.asarray(losses).reshape(-1)
      sps, ips = timer.report()
      log.info("step: %d, training loss mean: %.5e, training loss std: "
               "%.5e (%.2f steps/s, %.0f imgs/s)", log_step,
               losses_np.mean(), losses_np.std(), sps, ips)
      if tb_writer is not None:
        import tensorflow as tf
        with tb_writer.as_default(step=log_step):
          tf.summary.scalar("train/loss_mean", float(losses_np.mean()))
          tf.summary.scalar("train/loss_std", float(losses_np.std()))
          tf.summary.scalar("perf/steps_per_sec", float(sps))
          tf.summary.scalar("perf/imgs_per_sec", float(ips))
        tb_writer.flush()

    if (profile_dir and step0 <= initial_step + 10 <= last):
      with trace(profile_dir):
        state, key, losses = jitted_window(state, batches, key)
        np.asarray(losses)

    if crossed(config.training.snapshot_freq_for_preemption) is not None:
      ckpt.save_meta(state)

    snap_step = crossed(config.training.snapshot_freq)
    if snap_step is not None or last == n_iters:
      ckpt.save_snapshot(state,
                         (snap_step if snap_step is not None else last)
                         // config.training.snapshot_freq)

    if snap_step is not None and config.eval.enable_bpd:
      # report_dir makes the in-training bpd curve machine-readable
      # (workdir/bpd/bpd_<step>.npz) — the reference only logged these
      # (its save.py npz writes were dead code, see evaluation.py header)
      evaluation.compute_bpd(config, eval_ds, scaler, inverse_scaler,
                             nelbo_fn, nll_fn, model, state.ema_params,
                             step=snap_step,
                             report_dir=os.path.join(workdir, "bpd"))

    if (snap_step is not None or last == n_iters
        or config.training.get("whatever_sampling", False)):
      if config.training.snapshot_sampling:
        log.info("sampling start ...")
        evaluation.compute_fid_and_is(config, model, state.ema_params,
                                      sampling_fn, snap_step or last,
                                      sample_dir, assetdir,
                                      config.eval.num_samples,
                                      eval_ds=eval_ds)
    step0 += w
  return state


def evaluate(config, workdir, assetdir=None, eval_folder="eval"):
  """Evaluation pipeline (reference run_lib.py:115-163)."""
  eval_dir = os.path.join(workdir, eval_folder)
  os.makedirs(eval_dir, exist_ok=True)

  (sde, model, tx, state, ckpt, scaler, inverse_scaler, nll_fn, nelbo_fn,
   sampling_fn) = _build_everything(config, workdir, eval_mode=True)
  step = int(state.step)
  log.info("score model step: %d", step)
  # eval uses the EMA weights (reference run_lib.py:140); restore lands on
  # host (train/checkpoint.py) — upload once, not per sampler call
  params = jax.device_put(state.ema_params)

  _, eval_ds = datasets.get_dataset(config, evaluation_only=True)

  results = {}
  if config.eval.get("enable_loss", False) and config.training.continuous:
    # eval-mode score-matching loss under EMA weights; the reference's
    # eval.enable_loss knob gated a dead step_fn path (losses.py:279-293
    # hits an unbound variable) — this is the working equivalent.
    eval_loss_fn = jax.jit(make_eval_loss_step(config, sde, model))
    key = jax.random.PRNGKey(config.seed + 2)
    it = iter(eval_ds.as_numpy_iterator())
    vals = []
    for _ in range(config.eval.get("loss_iter", 10)):
      try:
        batch, it = datasets.get_batch(config, it, eval_ds)
      except StopIteration:
        break
      key, k_b = jax.random.split(key)
      vals.append(np.asarray(eval_loss_fn(params, scaler(batch), k_b)))
    if vals:
      vals = np.concatenate(vals)
      results["eval_loss_mean"] = float(vals.mean())
      results["eval_loss_std"] = float(vals.std())
      log.info("eval loss: mean %.5e std %.5e over %d examples",
               vals.mean(), vals.std(), vals.size)

  if config.eval.enable_bpd:
    results.update(evaluation.compute_bpd(
        config, eval_ds, scaler, inverse_scaler, nelbo_fn, nll_fn, model,
        params, step=step, eval=True))

  if config.eval.enable_sampling:
    log.info("sampling start ...")
    results.update(evaluation.compute_fid_and_is(
        config, model, params, sampling_fn, step, eval_dir, assetdir,
        config.eval.num_samples, eval_ds=eval_ds))
  return results
