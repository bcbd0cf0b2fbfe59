"""Config schema + per-dataset defaults.

Same surface as the reference's ml_collections schema
(configs/default_*_configs.py) so experiment knobs carry over verbatim —
minus ``config.device`` (device placement is the train step's jit/sharding
concern, not config state) and plus a few TPU-rebuild extensions
(``config.tpu.*``).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import ml_collections


def _cfg(d: Mapping[str, Any]) -> ml_collections.ConfigDict:
  c = ml_collections.ConfigDict()
  for k, v in d.items():
    setattr(c, k, v)
  return c


# Values identical to the reference defaults (configs/default_cifar10_configs
# .py:5-100 and siblings); organized as data instead of imperative setattrs.
_CIFAR10 = dict(
    training=dict(
        batch_size=128, n_iters=13000001, snapshot_freq=100000, log_freq=100,
        eval_freq=100, snapshot_freq_for_preemption=10000,
        snapshot_sampling=False, likelihood_weighting=True, continuous=True,
        reduce_mean=False, importance_sampling=True,
        unbounded_parametrization=False, ddpm_score=True, st=False,
        truncation_time=1e-5, num_train_data=50000,
        reconstruction_loss=False, stabilizing_constant=1e-3,
        whatever_sampling=False, mixed=False, ddpm_weight=0.01,
        balanced=False),
    sampling=dict(
        n_steps_each=1, noise_removal=True, probability_flow=False,
        snr=0.16, batch_size=1024, truncation_time=1e-5, sample_more=True,
        # rebuild extension: >0 splits the PC scan into bounded-length
        # device dispatches (watchdog/preemption safety at large batch);
        # 0 = one scan. Bit-identical either way.
        chunk=0,
        # rebuild extension: step count for sampling.method='dpm_solver'
        # (DPM-Solver++(2M), one score eval per step)
        dpm_steps=50,
        # rebuild extension: sampling.method='picard' (parallel-in-time
        # PC, sample/parallel.py): window length (a LATENCY play — keep
        # window*batch near the chip's utilization knee; 16 suits batch
        # 1-4 on v5e), per-position RMS convergence tolerance RELATIVE
        # to the state's own RMS (0 = exact sequential trajectory; an
        # absolute tol is unreachable on VE chains whose early states
        # have magnitude sigma_max ~ 50 — round-3 measured pathology),
        # and sweep cap (0 = window length, the exactness bound)
        # picard_tol > 0 is only a trajectory-error bound on DETERMINISTIC
        # chains (probability-flow predictor, no corrector noise; or the
        # DPM chain). On a stochastic PC chain the per-position residual
        # criterion passes while the endpoint decorrelates (measured rms
        # 63 vs sequential — ROOFLINE.md 'Parallel-in-time'), so
        # get_picard_pc_sampler refuses tol>0 there unless
        # picard_unsafe_tol=True opts in for experimentation.
        picard_window=16, picard_tol=1e-3, picard_max_sweeps=0,
        picard_unsafe_tol=False),
    eval=dict(
        begin_ckpt=9, end_ckpt=26, batch_size=200, enable_sampling=False,
        num_samples=50000, enable_loss=True, enable_bpd=False,
        bpd_dataset="test", num_test_data=10000, residual=True, lambda_=0.0,
        probability_flow=True, nelbo_iter=0, nll_iter=0),
    data=dict(
        dataset="CIFAR10", image_size=32, random_flip=True, centered=False,
        dequantization="none", num_channels=3,
        # rebuild extension: 'tf' = tf.data pipeline (reference parity);
        # 'native' = resident-array C++ batch assembler (data/native/)
        pipeline="tf"),
    model=dict(
        sigma_min=0.01, sigma_max=50.0, num_scales=1000, beta_min=0.1,
        beta_max=20.0, dropout=0.1, embedding_type="fourier",
        auxiliary_resblock=True, attention=True, fourier_feature=False,
        lsgm=False),
    optim=dict(
        weight_decay=0.0, optimizer="Adam", lr=2e-4, beta1=0.9, eps=1e-8,
        warmup=5000, grad_clip=1.0, num_micro_batch=1, amsgrad=False),
)


def _derive(base: Dict[str, Dict[str, Any]],
            changes: Dict[str, Dict[str, Any]],
            drop: Dict[str, list] | None = None) -> Dict[str, Dict[str, Any]]:
  out = {sec: dict(vals) for sec, vals in base.items()}
  for sec, vals in changes.items():
    out.setdefault(sec, {}).update(vals)
  for sec, keys in (drop or {}).items():
    for k in keys:
      out[sec].pop(k, None)
  return out


# configs/default_celeba_configs.py
_CELEBA = _derive(_CIFAR10, dict(
    training=dict(n_iters=1300001, snapshot_freq=50000, log_freq=50,
                  snapshot_sampling=True, likelihood_weighting=False,
                  num_train_data=162770),
    sampling=dict(snr=0.17, batch_size=512),
    eval=dict(begin_ckpt=1, batch_size=1024, num_test_data=19962),
    data=dict(dataset="CELEBA", image_size=64),
    model=dict(sigma_max=90.0),
))

# configs/default_lsun_configs.py
_LSUN = _derive(_CIFAR10, dict(
    training=dict(batch_size=64, n_iters=24000001, snapshot_freq=200000,
                  log_freq=1000, eval_freq=500,
                  snapshot_freq_for_preemption=5000,
                  snapshot_sampling=True, likelihood_weighting=False,
                  importance_sampling=False, num_train_data=162770),
    sampling=dict(snr=0.075, batch_size=16, truncation_time=1e-3),
    eval=dict(begin_ckpt=50, end_ckpt=96, batch_size=512,
              enable_sampling=True),
    data=dict(dataset="LSUN", image_size=256),
    model=dict(sigma_max=378.0, num_scales=2000, dropout=0.0),
), drop=dict(eval=["num_test_data", "residual", "lambda_",
                   "probability_flow", "nelbo_iter", "nll_iter"]))

# configs/default_stl10_configs.py
_STL10 = _derive(_CIFAR10, dict(
    training=dict(batch_size=196, num_train_data=105000),
    sampling=dict(snr=0.17),
    eval=dict(begin_ckpt=1, batch_size=512, enable_sampling=True,
              enable_loss=False),
    data=dict(dataset="STL10", image_size=48),
    model=dict(sigma_max=150.0),
))

_DEFAULTS = {
    "cifar10": _CIFAR10,
    "celeba": _CELEBA,
    "lsun": _LSUN,
    "stl10": _STL10,
}


def default_config(dataset: str = "cifar10") -> ml_collections.ConfigDict:
  """Build the default ConfigDict for a dataset family."""
  spec = _DEFAULTS[dataset.lower()]
  config = ml_collections.ConfigDict()
  for section, values in spec.items():
    setattr(config, section, _cfg(values))
  config.seed = 42

  # TPU-rebuild extensions (absent from the reference schema; all optional).
  config.tpu = _cfg(dict(
      mesh_shape=(),            # () = all devices on one 'data' axis
      compute_dtype="float32",  # 'bfloat16' for speed on TPU
      remat=False,              # jax.checkpoint the resblocks (1024^2 runs)
      # 'full' | 'conv_outputs' (store only conv results, recompute
      # norm/act chains — trades VPU reflops for HBM traffic)
      remat_policy="full",
      donate_state=True,
      # 'unsafe_rbg' makes dropout-mask generation ~25% of step time
      # cheaper than threefry on TPU; streams are not bit-reproducible
      # across backends but statistically sound.
      rng_impl="threefry2x32",
      # random bits per dropout-mask element (models/dropout.py): 32 =
      # exact nn.Dropout parity; 16/8 pack 2/4 mask lanes per threefry
      # word — same determinism and sharding invariance as 32, keep-rate
      # quantized to 1/2^bits (at 8: rate 0.1 -> 26/256 ~ 0.1016).
      # DEFAULT 0 = auto (int sentinel — ml_collections type-locks the
      # field, and tools/tests override with ints): resolve per the
      # ACTIVE PRNG impl at model build
      # (models/ncsnpp.py from_config) — 8 under threefry, where packing
      # recovers the per-element hash tax (same-session v5e pair: 1,877
      # imgs/s vs 1,551 at bits=32, +21%); 32 under rbg/unsafe_rbg, where
      # there is no hash tax to recover and the bit-unpack only ADDS HBM
      # traffic (same-session v5e pair in benchmarks/train_sweep.jsonl;
      # an unconditional 8 regressed the rbg bench 2,001->1,910 imgs/s,
      # +4.3 GB/step, BENCH_r04). Set 32 for masks bit-identical to
      # flax.linen.Dropout regardless of impl.
      dropout_bits=0,
      # 'bfloat16' runs GroupNorm statistics in bf16 too. Measured on a
      # v5e: +9% TRAIN step time (keep f32 for training), but -9% PC
      # sampling / -5% DPM sampling per eval (forward-only pays no
      # backward penalty) — worth enabling for sampling-only workloads.
      norm_dtype="float32",
      # activation-byte diet (ops/quant.py): 'float8_e4m3' stores every
      # conv INPUT activation in HBM as e4m3 (1 byte/elt; the cast fuses
      # into the producer, the consumer conv upconverts in-kernel) and
      # runs backward cotangents through an e5m2 round-trip; weights,
      # norms, and optimizer state stay f32. The train step is
      # HBM-bandwidth-bound at ~95% of the v5e roofline, so this is the
      # one lever that moves the single-chip ceiling itself. Measured
      # keep/revert record in benchmarks/ROOFLINE.md; trajectory-drift +
      # param-tree-compat tests in tests/test_fp8_quant.py. '' = off
      # (reference f32 semantics).
      activation_dtype="",
      # FID featurization resize: 'host' = cleanfid PIL bicubic, bit
      # parity with the reference; 'device' = jax cubic inside the jitted
      # extractor (same Keys bicubic for upscaling, measured max 4.7e-4
      # deviation on [0,255]; 350x less host->device transfer; falls back
      # to host for >=299px inputs). A 1-core host makes 'host' the 50k
      # featurize bottleneck (~20 ms/img measured).
      fid_resize="host",
      # persistent XLA compilation cache: big sampler/high-res programs
      # take minutes to compile (3-25 min at 256^2+); with a cache dir the
      # second run of the same program loads in seconds. '' disables.
      compilation_cache_dir="~/.cache/soft_truncation_tpu_xla",
      # optimizer/EMA byte diet (the only f32 state traffic left on an
      # HBM-bound step, ~2.3 GB/step at 62M params — ROOFLINE.md):
      # 'bfloat16' stores the EMA shadow / Adam first moment in bf16
      # (update math stays f32). Measured effect + keep/revert decision
      # in benchmarks/ROOFLINE.md.
      ema_dtype="float32",
      adam_mu_dtype="float32",
      # K train steps per host dispatch (lax.scan inside ONE XLA
      # program), for runtimes where per-dispatch overhead is not hidden
      # by async pipelining (slow data loops, very small models).
      # MEASURED on the tunneled v5e: K=1 wins (1,883 imgs/s vs 1,825 at
      # K=8, unsafe_rbg) — JAX's async dispatch already pipelines the
      # host loop, and the K-scan program runs ~2 ms/step slower; see
      # benchmarks/ROOFLINE.md "End-to-end CLI". Log/snapshot events
      # fire at the window boundary crossing their nominal step; a
      # partial tail window compiles a second program (persistent cache
      # absorbs it after the first run).
      steps_per_dispatch=1,
  ))
  # uint8 batch transport (4x fewer host->device bytes; device redoes
  # x/255 bit-identically): 'auto' enables it only for provably
  # grid-exact pipelines — see data.datasets.transport_uint8.
  config.data.transport_dtype = "auto"
  return config


def override(config: ml_collections.ConfigDict,
             changes: Dict[str, Any]) -> ml_collections.ConfigDict:
  """Apply {section: {key: value}} overrides (new keys allowed; numeric
  type changes like int->float allowed)."""
  with config.ignore_type():
    for section, values in changes.items():
      if not isinstance(values, dict):
        setattr(config, section, values)
        continue
      sub = getattr(config, section, None)
      if sub is None:
        setattr(config, section, _cfg(values))
        continue
      with sub.ignore_type():
        for k, v in values.items():
          setattr(sub, k, v)
  return config
