"""Parallel-in-time (Picard) sampler tests (sample/parallel.py).

The load-bearing property: with ``picard_tol = 0`` the Picard fixed
point is the EXACT sequential PC trajectory — same config, same PRNG
key, the parallel sampler must reproduce `get_pc_sampler`'s output to
floating-point reordering tolerance (the per-step updates with frozen
noises telescope; see the module docstring). Covered across SDE
families, predictors, correctors, window/block splits, and the
probability-flow path; plus tolerance monotonicity of the measured NFE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.data import get_data_inverse_scaler
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.sample import get_sampling_fn
from soft_truncation_tpu.sde import get_sde

SHAPE = (2, 8, 8, 3)
EXACT = dict(rtol=1e-4, atol=1e-4)


def _config(sde="vesde", predictor="reverse_diffusion",
            corrector="langevin", n_steps_each=1, probability_flow=False,
            num_scales=8, **picard):
  config = default_config("cifar10")
  override(config, {
      "training": dict(sde=sde, continuous=True, eta=1e-6,
                       truncation_time=1e-3),
      "data": dict(image_size=8, centered=False),
      "sampling": dict(method="pc", predictor=predictor,
                       corrector=corrector, snr=0.16,
                       n_steps_each=n_steps_each,
                       probability_flow=probability_flow,
                       noise_removal=True),
      "model": dict(
          name="ncsnpp",
          scale_by_sigma=sde in ("vesde", "reciprocal_vesde"),
          ema_rate=0.999, normalization="GroupNorm", nonlinearity="swish",
          nf=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,),
          resamp_with_conv=True, conditional=True, fir=False,
          fir_kernel=[1, 3, 3, 1], skip_rescale=True,
          resblock_type="biggan", progressive="none",
          progressive_input="none", progressive_combine="sum",
          init_scale=0.0, embedding_type="fourier", fourier_scale=16,
          num_scales=num_scales),
  })
  for k, v in picard.items():
    setattr(config.sampling, k, v)
  return config


def _params(config, model):
  x = jnp.zeros(SHAPE)
  t = jnp.full((SHAPE[0],), 1.0)
  return model.init({"params": jax.random.PRNGKey(0)}, x, t,
                    train=False)["params"]


def _run(config, key=7):
  sde = get_sde(config)
  model = create_model(config)
  params = _params(config, model)
  sampler = get_sampling_fn(config, sde, SHAPE,
                            get_data_inverse_scaler(config),
                            eps=config.sampling.truncation_time)
  samples, nfe = jax.jit(sampler, static_argnums=0)(
      model, params, jax.random.PRNGKey(key))
  return np.asarray(samples), int(nfe)


def _seq_vs_picard(seq_cfg, **picard):
  want, seq_nfe = _run(seq_cfg)
  pic_cfg = _config(**{**_fields(seq_cfg), **picard})
  pic_cfg.sampling.method = "picard"
  got, nfe = _run(pic_cfg)
  return want, got, seq_nfe, nfe


def _fields(config):
  return dict(sde=config.training.sde,
              predictor=config.sampling.predictor,
              corrector=config.sampling.corrector,
              n_steps_each=config.sampling.n_steps_each,
              probability_flow=config.sampling.probability_flow,
              num_scales=config.model.num_scales)


# fast subset carries one PC case and one DPM case (full coverage stays
# in the regular suite — each case compiles two samplers, ~40s apiece)
@pytest.mark.parametrize("sde,predictor,corrector", [
    pytest.param("vesde", "reverse_diffusion", "langevin",
                 marks=pytest.mark.fast),
    ("vpsde", "euler_maruyama", "none"),
    ("vpsde", "ancestral_sampling", "none"),
    ("reciprocal_vesde", "reverse_diffusion", "none"),
])
def test_exact_fixed_point_matches_sequential(sde, predictor, corrector):
  """tol=0 Picard == sequential PC, same key, any SDE/predictor mix
  (incl. the RVE next_t discretization path)."""
  seq = _config(sde=sde, predictor=predictor, corrector=corrector)
  want, got, _, _ = _seq_vs_picard(
      seq, picard_window=4, picard_tol=0.0)
  np.testing.assert_allclose(got, want, **EXACT)


def test_exact_with_window_not_dividing_n():
  """num_scales=10, window=4 -> two full blocks + a tail block of 2."""
  seq = _config(num_scales=10)
  want, got, _, _ = _seq_vs_picard(
      seq, picard_window=4, picard_tol=0.0)
  np.testing.assert_allclose(got, want, **EXACT)


def test_exact_multi_substep_corrector():
  """n_steps_each=2: the corrector's internal key split/scan must fold
  into the per-step map identically under the window vmap."""
  seq = _config(n_steps_each=2, num_scales=6)
  want, got, seq_nfe, nfe = _seq_vs_picard(
      seq, picard_window=3, picard_tol=0.0)
  np.testing.assert_allclose(got, want, **EXACT)
  assert seq_nfe == 6 * 3  # N x (n_steps + 1)
  assert 0 < nfe <= 2 * 3 * 3 * 3  # blocks x sweeps<=W x W x evals


def test_exact_chunked_dispatches():
  """sampling.chunk > 0 splits the Picard chain into bounded host
  dispatches (self-jitting segments) — tol=0 exactness is partition-
  independent, so the chunked result equals the sequential sampler."""
  seq = _config(num_scales=10)
  want, _ = _run(seq)
  cfg = _config(num_scales=10, picard_window=4, picard_tol=0.0, chunk=3)
  cfg.sampling.method = "picard"
  sde = get_sde(cfg)
  model = create_model(cfg)
  params = _params(cfg, model)
  sampler = get_sampling_fn(cfg, sde, SHAPE,
                            get_data_inverse_scaler(cfg),
                            eps=cfg.sampling.truncation_time)
  assert getattr(sampler, "self_jitting", False)  # do not outer-jit
  got, nfe = sampler(model, params, jax.random.PRNGKey(7))
  np.testing.assert_allclose(np.asarray(got), want, **EXACT)
  assert 0 < int(nfe) <= 10 * 4 * 2  # <= N x W sweeps x evals_per_step


def test_exact_window_whole_trajectory():
  seq = _config(num_scales=6)
  want, got, _, _ = _seq_vs_picard(
      seq, picard_window=64, picard_tol=0.0)  # clamped to N
  np.testing.assert_allclose(got, want, **EXACT)


def test_probability_flow_path():
  seq = _config(predictor="reverse_diffusion", corrector="none",
                probability_flow=True)
  want, got, _, _ = _seq_vs_picard(
      seq, picard_window=4, picard_tol=0.0)
  np.testing.assert_allclose(got, want, **EXACT)


def test_nfe_accounting_and_tol_monotonicity():
  """The measured NFE is bounded by the W-sweep exactness guarantee and
  never increases when the tolerance is loosened; loose-tol samples stay
  near the sequential trajectory.

  Deviations are RELATIVE: tol=0 equals the sequential chain in exact
  arithmetic, and in f32 the residual is ulp reordering noise amplified
  by the chain's conditioning (verified down to ~1e-7 relative on a
  linear score). corrector='none' here keeps the untrained-net chain
  well-conditioned — the SNR-adaptive Langevin step size ~ 1/grad_norm^2
  is chaotic for a near-zero random score, which would amplify ulp noise
  regardless of sampler correctness (trained scores are contracting;
  this is the regime the ParaDiGMS paper relies on)."""
  seq = _config(num_scales=16, corrector="none")
  want, _ = _run(seq)
  scale = float(np.sqrt(np.mean(want ** 2))) or 1.0

  nfes, devs = {}, {}
  for tol in (0.0, 1e-3, 5e-2):
    # tol>0 on this stochastic chain (predictor noise) needs the explicit
    # experimentation opt-in — this test exists to MEASURE that regime.
    cfg = _config(num_scales=16, corrector="none",
                  picard_window=8, picard_tol=tol,
                  picard_unsafe_tol=True)
    cfg.sampling.method = "picard"
    got, nfe = _run(cfg)
    nfes[tol] = nfe
    devs[tol] = float(np.sqrt(np.mean((got - want) ** 2))) / scale

  W, n_blocks, evals = 8, 2, 2  # n_steps_each=1 -> 2 evals per step
  assert 0 < nfes[0.0] <= n_blocks * W * W * evals
  assert nfes[5e-2] <= nfes[1e-3] <= nfes[0.0]
  assert devs[0.0] < 1e-4
  assert devs[1e-3] < 1e-2  # loose tol degrades gracefully


@pytest.mark.parametrize("corrector", ["none", "langevin"])
def test_quality_at_shipped_default_tol(corrector):
  """The SHIPPED default tol (configs/base.py picard_tol, read from the
  config rather than hardcoded) on a STOCHASTIC chain now refuses loudly
  (the round-4 verdict: the residual criterion passes while trajectories
  decorrelate at scale) — and with the explicit unsafe opt-in the small-
  chain quality regression check still holds (the round-3 pathology was
  defaults — absolute tol, window 64 — that produced diverged samples)."""
  seq = _config(corrector=corrector, num_scales=16)
  want, _ = _run(seq)
  scale = float(np.sqrt(np.mean(want ** 2))) or 1.0

  cfg = _config(corrector=corrector, num_scales=16)
  cfg.sampling.method = "picard"  # defaults: window/tol from base config
  assert cfg.sampling.picard_tol > 0  # shipped default is NOT exact mode
  with pytest.raises(ValueError, match="stochastic chain"):
    _run(cfg)  # the guard: no silent decorrelated samples

  cfg.sampling.picard_unsafe_tol = True
  got, nfe = _run(cfg)
  rel = float(np.sqrt(np.mean((got - want) ** 2))) / scale
  assert rel < 1e-2, rel
  assert nfe > 0


def test_tol_allowed_on_deterministic_chain():
  """Probability-flow predictor + no corrector is a deterministic chain:
  tol > 0 keeps its contraction-criterion meaning and needs NO opt-in."""
  cfg = _config(predictor="reverse_diffusion", corrector="none",
                probability_flow=True, num_scales=8,
                picard_window=4, picard_tol=1e-3)
  cfg.sampling.method = "picard"
  got, nfe = _run(cfg)
  assert got.shape == SHAPE and np.isfinite(got).all() and nfe > 0


def test_shapes_finite_and_in_range():
  cfg = _config(picard_window=4, picard_tol=1e-3,
                picard_unsafe_tol=True)  # stochastic chain: explicit opt-in
  cfg.sampling.method = "picard"
  got, nfe = _run(cfg)
  assert got.shape == SHAPE and np.isfinite(got).all() and nfe > 0


@pytest.mark.parametrize("sde", [
    pytest.param("vpsde", marks=pytest.mark.fast), "vesde"])
def test_picard_dpm_exact_fixed_point(sde):
  """tol=0 parallel-in-time DPM-Solver++(2M) == the sequential solver,
  same key (the (x, prev data-prediction) augmented state turns the
  multistep recurrence into a telescoping one-step chain)."""
  seq = _config(sde=sde, num_scales=1000)  # DPM ignores num_scales' grid
  seq.sampling.method = "dpm_solver"
  seq.sampling.dpm_steps = 8
  want, seq_nfe = _run(seq)
  assert seq_nfe == 9  # 8 steps + denoise

  cfg = _config(sde=sde, num_scales=1000, picard_window=4, picard_tol=0.0)
  cfg.sampling.method = "picard_dpm"
  cfg.sampling.dpm_steps = 8
  got, nfe = _run(cfg)
  np.testing.assert_allclose(got, want, **EXACT)
  assert 0 < nfe <= 2 * 4 * 4 + 1  # 2 blocks x <=W sweeps x W evals + denoise


def test_picard_dpm_single_block_and_loose_tol():
  seq = _config(num_scales=1000)
  seq.sampling.method = "dpm_solver"
  seq.sampling.dpm_steps = 8
  want, _ = _run(seq)
  scale = float(np.sqrt(np.mean(want ** 2))) or 1.0

  cfg = _config(num_scales=1000, picard_window=0, picard_tol=1e-3)
  cfg.sampling.method = "picard_dpm"
  cfg.sampling.dpm_steps = 8
  got, nfe = _run(cfg)
  rel = float(np.sqrt(np.mean((got - want) ** 2))) / scale
  assert rel < 1e-2 and 0 < nfe <= 8 * 8 + 1
