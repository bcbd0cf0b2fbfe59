"""Parallel-in-time (Picard) sampling — beyond-parity fast paths.

ParaDiGMS (Shih et al., "Parallel Sampling of Diffusion Models",
arXiv:2305.16317) adapted to this framework's samplers. The reference
(sampling.py:365-433) — and our `get_pc_sampler` / `get_dpm_solver_
sampler` — runs N strictly sequential network evaluations per batch; at
small batch (single-image latency, high-resolution configs) the chip is
mostly idle inside each eval. These samplers batch over the TIME axis
instead: they hold a window of W trajectory guesses, evaluate all W
per-step updates in ONE batched network call (W x batch images), and
Picard-iterate the window to its fixed point.

Why the fixed point is EXACT (not an approximation): with all per-step
noises frozen (drawn from the same key chain the sequential sampler
uses), one step is s_{j+1} = s_j + g_j(s_j) for a deterministic g_j —
for PC the state s is the sample x; for the multistep DPM-Solver++(2M)
it is the pair (x, previous data-prediction), which turns the two-step
recurrence into a one-step chain. The Picard sweep

    S'[j+1] = s_in + sum_{i<=j} g_i(S[i])        (a cumsum over the window)

telescopes at stationarity to S[j+1] = S[j] + g_j(S[j]) — the sequential
recursion itself. Information provably propagates at least one window
position per sweep, so `max_sweeps = W` always reaches the exact
trajectory; in practice diffusion increments depend weakly on the state
and the window converges in far fewer sweeps (the paper's source of
speedup). Wall-clock win = (sequential steps) / (sweeps actually
needed), as long as the chip has idle capacity to absorb the W-fold
larger batch — the TPU regime at batch 1-8.

Tolerance: a window position counts as converged when the RMS change of
its state between sweeps is <= `tol` RELATIVE to that position's own
state RMS (floored at 1, the data scale — inputs live in [-1, 1]). The
relative form matters: a VE chain's early states have magnitude
sigma_max ~ 50, so an absolute tolerance in data units is either
unreachable there (round-3 on-chip A/B: sweeps blew up to ~121x the
sequential NFE) or meaningless near t=T. `tol = 0` forces the exact
fixed point (tested against the sequential samplers with the same PRNG
key in tests/test_picard_parallel.py).

STOCHASTIC chains require tol = 0. The sweep-to-sweep change equals the
fixed-point residual of the previous iterate, so tol bounds the
per-position residual — but it is NOT a trajectory-error bound: on a
noise-dominated PC chain a ~tol-relative residual injected at every one
of N positions random-walks the endpoint completely off the sequential
trajectory (measured on-chip: tol=1e-3 windows "converge" in ~2 sweeps
while the final sample sits at rms 63 vs the sequential run's — two
independent draws at that state scale; benchmarks/ROOFLINE.md
"Parallel-in-time"). Deterministic chains (probability-flow predictor
with no corrector noise, or the DPM chain) contract to their unique
trajectory, so tol > 0 keeps its usual meaning there.
`get_picard_pc_sampler` therefore REFUSES tol > 0 on a stochastic chain
unless `unsafe_tol=True` (config: `sampling.picard_unsafe_tol`) is
passed explicitly for experimentation.

Floating-point caveat: "exact" means exact in exact arithmetic. In f32
the prefix-sum evaluates the same chain in a different summation order,
so the residual is ulp-level noise amplified by the chain's conditioning
(measured ~1e-7 RELATIVE on a linear score across N, W). Trained scores
are contracting and benign; an UNTRAINED near-zero score under the
SNR-adaptive Langevin corrector (step size ~ 1/grad_norm^2) is chaotic
and amplifies ulp noise with trajectory length — a property of that
chain, not of this sampler.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..models.score import get_score_fn
from ..sde.core import SDE, ReciprocalVESDE, ReverseSDE
from .sampling import (_denoise_step, _dpm_data_pred_fn, _dpm_schedule,
                       _dpm_step_fn, get_corrector, get_predictor)

Array = jax.Array


def _picard_chain(step_fn, s_in, n: int, window: int, tol: float,
                  max_sweeps: int, evals_per_step: int):
  """Run the chain s_{i+1} = step_fn(s_i, i)[0] for i in [0, n) by
  block-wise Picard iteration over pytree states.

  step_fn(s, i) -> (s_next, aux) where aux is any pytree computed by the
  step (e.g. the predictor's x_mean); the aux of the LAST executed step
  is returned alongside the final state. Returns (s_n, aux_last, nfe)
  with nfe = sweeps x window positions x evals_per_step summed over
  blocks (a traced scalar — sweeps are data-dependent)."""
  W = max(1, min(int(window), n))
  n_full = n // W
  tail = n - n_full * W
  max_sweeps_ = int(max_sweeps) if max_sweeps else W

  vstep = jax.vmap(step_fn, in_axes=(0, 0))

  def _rms_err(Sn, S):
    """Max over leaves and window positions of the per-position RMS
    state change between sweeps, RELATIVE to the position's own state
    RMS (floored at 1, the data scale). Scale-free across VP chains
    (state ~ O(1)) and VE chains (state ~ sigma(t), up to sigma_max ~ 50
    near t=T) — an absolute criterion is unreachable on the latter."""
    def leaf(a, b):
      d = (a - b).reshape(a.shape[0], -1)

      def rms(x):
        x = x.reshape(x.shape[0], -1)
        return jnp.sqrt(jnp.mean(x * x, axis=-1))
      # the SMALLER of old/new state RMS: a blow-up in either direction
      # keeps the error large instead of inflating the denominator
      scale = jnp.maximum(jnp.minimum(rms(a), rms(b)), 1.0)
      return jnp.max(rms(d) / scale)
    return jnp.max(jnp.stack(jax.tree.leaves(
        jax.tree.map(leaf, Sn, S))))

  def run_block(s_in_blk, aux_in, idx0, w_blk):
    idxs = idx0 + jnp.arange(w_blk)
    S0 = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (w_blk,) + l.shape), s_in_blk)

    def cond(carry):
      _, _, _, err, sweeps = carry
      # Non-finite err means not-yet-visited window positions exploded
      # (their garbage guesses can overflow in f32 before the exact
      # prefix reaches them) — that is "not converged", NOT "done": the
      # exact prefix still grows >= 1 position per sweep regardless of
      # the tail (position j's cumsum only reads increments i < j), so
      # iterating to max_sweeps_ washes the garbage out. A plain
      # `err > tol` is False for NaN and would exit with garbage.
      not_converged = jnp.logical_or(~jnp.isfinite(err), err > tol)
      return jnp.logical_and(not_converged, sweeps < max_sweeps_)

    def body(carry):
      S, _, _, _, sweeps = carry
      S_new, aux = vstep(S, idxs)
      csum = jax.tree.map(
          lambda a, b: jnp.cumsum(a - b, axis=0), S_new, S)
      # S[0] is pinned to the block entry state; positions j >= 1 get
      # the prefix-summed update (the Picard sweep).
      Sn = jax.tree.map(
          lambda s, c, si: jnp.concatenate([s[:1], si[None] + c[:-1]], 0),
          S, csum, s_in_blk)
      err = _rms_err(Sn, S)
      out = jax.tree.map(lambda si, c: si + c[-1], s_in_blk, csum)
      aux_last = jax.tree.map(lambda l: l[-1], aux)
      return Sn, out, aux_last, err, sweeps + 1

    init = (S0, s_in_blk, aux_in, jnp.asarray(jnp.inf), jnp.asarray(0))
    _, out, aux_last, _, sweeps = jax.lax.while_loop(cond, body, init)
    return out, aux_last, sweeps * w_blk * evals_per_step

  # aux structure probe: one abstract evaluation (no FLOPs at runtime —
  # only used to build a zero-initialized aux carry of the right shape).
  aux_shape = jax.eval_shape(
      lambda s: step_fn(s, jnp.asarray(0))[1], s_in)
  aux = jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype), aux_shape)

  s = s_in
  nfe = jnp.asarray(0)
  if n_full:
    def block_body(carry, b):
      s, aux, nfe = carry
      out, aux_last, block_nfe = run_block(s, aux, b * W, W)
      return (out, aux_last, nfe + block_nfe), None

    (s, aux, nfe), _ = jax.lax.scan(block_body, (s, aux, nfe),
                                    jnp.arange(n_full))
  if tail:
    s, aux, tail_nfe = run_block(s, aux, n_full * W, tail)
    nfe = nfe + tail_nfe
  return s, aux, nfe


def get_picard_pc_sampler(config, sde: SDE, shape, predictor: str,
                          corrector: str, inverse_scaler, snr: float,
                          n_steps: int = 1, probability_flow: bool = False,
                          continuous: bool = False, denoise: bool = True,
                          eps: float = 1e-3, window: int = 16,
                          tol: float = 1e-3,
                          max_sweeps: int = 0,
                          unsafe_tol: bool = False) -> Callable:
  """Drop-in PC sampler (same flags as get_pc_sampler) with parallel-in-
  time Picard iteration. Returns sampler(model, params, key) ->
  (samples in [0,1], nfe) where nfe is the MEASURED number of network
  evaluations.

  ``config.sampling.chunk > 0`` bounds device dispatches like the
  sequential sampler's chunked mode (get_pc_sampler): each dispatch
  Picard-iterates ~chunk chain steps (rounded up to whole windows), so
  per-dispatch work is <= ceil(chunk/W) blocks x max_sweeps sweeps —
  without it, a 1000-step chain at full-W sweeps is one unbounded
  dispatch, the condition observed to crash the tunneled runtime's
  watchdog. tol=0 exactness is partition-independent (block boundaries
  only change the iteration path, not the fixed point); the chunked
  sampler jits its segments internally — do NOT wrap it in an outer jit
  (tagged ``self_jitting=True``)."""
  # tol > 0 early exit is only sound on chains whose fixed point is a
  # contracting deterministic trajectory. On a stochastic chain the
  # criterion passes while the trajectory decorrelates (module
  # docstring; measured rms 63 ~= two independent draws) — refuse
  # loudly instead of returning wrong samples.
  stochastic = ((not probability_flow)            # predictor noise (lambda=1)
                or predictor == "ancestral_sampling"  # noise regardless
                or (corrector != "none" and n_steps > 0))  # Langevin noise
  if stochastic and tol > 0 and not unsafe_tol:
    raise ValueError(
        "picard: tol > 0 on a stochastic chain (probability_flow="
        f"{probability_flow}, predictor={predictor!r}, corrector="
        f"{corrector!r}) silently produces decorrelated samples — the "
        "sweep-to-sweep criterion bounds the per-position residual, not "
        "the trajectory error (benchmarks/ROOFLINE.md 'Parallel-in-"
        "time'). Set sampling.picard_tol=0 (exact fixed point, "
        "max_sweeps=window telescoping) or opt in explicitly with "
        "sampling.picard_unsafe_tol=True.")
  predictor_fn = get_predictor(predictor)
  corrector_fn = get_corrector(corrector)
  N = sde.N
  evals_per_step = n_steps + 1  # corrector sub-steps + predictor
  chunk = int(config.sampling.get("chunk", 0) or 0)

  timesteps = jnp.linspace(sde.T, eps, N)
  next_timesteps = jnp.concatenate([timesteps[1:], jnp.zeros((1,))])

  def _segment(model, params, x, key, start, steps):
    """Picard-iterate chain steps [start, start+steps). ``steps`` is
    static; ``start`` is traced (one compile for equal-size segments).
    ``key`` is the post-prior key: the full N-step key chain is
    recomputed (cheap) so noises are identical however the chain is
    partitioned — the sequential sampler's exact chain (sampling.py
    _scan body: key, k_c, k_p = split(key, 3) per step)."""
    score_fn = get_score_fn(config, sde, model, params, train=False,
                            continuous=continuous)
    rsde = ReverseSDE(sde, score_fn, probability_flow=probability_flow,
                      lambda_=0.0 if probability_flow else 1.0)

    def key_chain(k, _):
      k, k_c, k_p = jax.random.split(k, 3)
      return k, (k_c, k_p)

    _, (keys_c, keys_p) = jax.lax.scan(key_chain, key, None, length=N)

    def pc_step(x, i):
      """One full corrector+predictor step at global step index i."""
      t_vec = jnp.full((shape[0],), timesteps[i])
      nt_vec = jnp.full((shape[0],), next_timesteps[i])
      x, _ = corrector_fn(sde, score_fn, x, t_vec, keys_c[i], snr, n_steps)
      x, x_mean = predictor_fn(
          rsde, x, t_vec, keys_p[i],
          next_t=nt_vec if isinstance(sde, ReciprocalVESDE) else None)
      return x, x_mean

    return _picard_chain(lambda s, i: pc_step(s, i + start), x, steps,
                         window, tol, max_sweeps, evals_per_step)

  def _finish(model, params, x, x_mean):
    """Final denoise to the t=0 mean, shared with get_pc_sampler."""
    score_fn = get_score_fn(config, sde, model, params, train=False,
                            continuous=continuous)
    out = _denoise_step(config, sde, score_fn, x_mean if denoise else x,
                        sde.eps, probability_flow=True)
    return inverse_scaler(out)

  if 0 < chunk < N:
    # round the dispatch length up to whole windows so blocks are never
    # split below the configured window size
    W = max(1, min(int(window), N))
    seg = max(1, (chunk + W - 1) // W) * W
    seg_jit = jax.jit(_segment, static_argnums=(0, 5))
    finish_jit = jax.jit(_finish, static_argnums=0)

    def sampler(model, params, key) -> Tuple[Array, Array]:
      key, k_prior = jax.random.split(key)
      x = sde.prior_sampling(k_prior, shape)
      x_mean = x
      nfe = jnp.asarray(0)
      for s0 in range(0, N, seg):
        steps = min(seg, N - s0)
        x, x_mean, seg_nfe = seg_jit(model, params, x, key,
                                     jnp.asarray(s0), steps)
        nfe = nfe + seg_nfe
      return finish_jit(model, params, x, x_mean), nfe

    sampler.self_jitting = True
    return sampler

  def sampler(model, params, key) -> Tuple[Array, Array]:
    key, k_prior = jax.random.split(key)
    x0 = sde.prior_sampling(k_prior, shape)
    x, x_mean, nfe = _segment(model, params, x0, key, jnp.asarray(0), N)
    return _finish(model, params, x, x_mean), nfe

  return sampler


def get_picard_dpm_sampler(config, sde: SDE, shape, inverse_scaler,
                           steps: int = 50, denoise: bool = True,
                           eps: float = 1e-3, window: int = 0,
                           tol: float = 1e-3,
                           max_sweeps: int = 0) -> Callable:
  """Parallel-in-time DPM-Solver++(2M) — the same schedule/update as
  get_dpm_solver_sampler (sampling.py), Picard-iterated over the
  augmented state (x, previous data-prediction) so the two-step
  recurrence is a one-step chain the engine can telescope. Deterministic
  (no per-step noise): only the prior key matters. With the default
  window=0 the whole trajectory is one block (steps is small)."""
  N = int(steps)

  def sampler(model, params, key) -> Tuple[Array, Array]:
    score_fn = get_score_fn(config, sde, model, params, train=False,
                            continuous=True)
    key, k_prior = jax.random.split(key)
    x = sde.prior_sampling(k_prior, shape)

    # The schedule and step update are the shared sequential-solver
    # helpers (sampling._dpm_schedule/_dpm_step_fn), so a fix there
    # cannot silently break the tol=0 == sequential guarantee here.
    ts, c_all, s_all, lam = _dpm_schedule(sde, N, eps)
    data_pred = _dpm_data_pred_fn(score_fn, shape, ts, c_all, s_all)
    dpm_step = _dpm_step_fn(data_pred, c_all, s_all, lam)

    (x, _), _, nfe = _picard_chain(
        dpm_step, (x, jnp.zeros_like(x)), N, window or N, tol,
        max_sweeps, evals_per_step=1)
    if denoise:
      x = data_pred(x, N)
      nfe = nfe + 1
    return inverse_scaler(x), nfe

  return sampler
