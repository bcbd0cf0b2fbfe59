"""Parallel-in-time (Picard) PC sampling — beyond-parity fast path.

ParaDiGMS (Shih et al., "Parallel Sampling of Diffusion Models",
arXiv:2305.16317) adapted to this framework's predictor-corrector
samplers. The reference (sampling.py:365-433) — and our `get_pc_sampler`
— runs N=1000-2000 strictly sequential network evaluations per batch;
at small batch (single-image latency, high-resolution configs) the chip
is mostly idle inside each eval. This sampler batches over the TIME
axis instead: it holds a window of W trajectory guesses, evaluates all
W per-step updates in ONE batched network call (W x batch images), and
Picard-iterates the window to its fixed point.

Why the fixed point is EXACT (not an approximation): with all per-step
noises frozen (drawn from the same key chain the sequential sampler
uses), one PC step is x_{j+1} = x_j + g_j(x_j) for a deterministic g_j.
The Picard sweep

    X'[j+1] = x_in + sum_{i<=j} g_i(X[i])        (a cumsum over the window)

telescopes at stationarity to X[j+1] = X[j] + g_j(X[j]) — the sequential
recursion itself. Information provably propagates at least one window
position per sweep, so `max_sweeps = W` always reaches the exact
trajectory; in practice diffusion increments depend weakly on x and the
window converges in far fewer sweeps (the paper's source of speedup).
Wall-clock win = (sequential steps) / (sweeps actually needed), as long
as the chip has idle capacity to absorb the W-fold larger batch — the
TPU regime at batch 1-8.

Tolerance: a window position counts as converged when the RMS change of
its state between sweeps is <= `tol` (absolute, data units — inputs live
in [-1, 1]). `tol = 0` forces the exact fixed point (tested against
`get_pc_sampler` with the same PRNG key in tests/test_picard_parallel.py).

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
from .sampling import get_corrector, get_predictor

Array = jax.Array


def get_picard_pc_sampler(config, sde: SDE, shape, predictor: str,
                          corrector: str, inverse_scaler, snr: float,
                          n_steps: int = 1, probability_flow: bool = False,
                          continuous: bool = False, denoise: bool = True,
                          eps: float = 1e-3, window: int = 64,
                          tol: float = 1e-2,
                          max_sweeps: int = 0) -> Callable:
  """Drop-in PC sampler (same flags as get_pc_sampler) with parallel-in-
  time Picard iteration. Returns sampler(model, params, key) ->
  (samples in [0,1], nfe) where nfe is the MEASURED number of network
  evaluations (a traced scalar: sweeps are data-dependent)."""
  predictor_fn = get_predictor(predictor)
  corrector_fn = get_corrector(corrector)
  N = sde.N
  W = max(1, min(int(window), N))
  n_full = N // W
  tail = N - n_full * W
  max_sweeps_ = int(max_sweeps) if max_sweeps else W
  evals_per_step = n_steps + 1  # corrector sub-steps + predictor

  timesteps = jnp.linspace(sde.T, eps, N)
  next_timesteps = jnp.concatenate([timesteps[1:], jnp.zeros((1,))])

  def sampler(model, params, key) -> Tuple[Array, Array]:
    score_fn = get_score_fn(config, sde, model, params, train=False,
                            continuous=continuous)
    rsde = ReverseSDE(sde, score_fn, probability_flow=probability_flow,
                      lambda_=0.0 if probability_flow else 1.0)

    key, k_prior = jax.random.split(key)
    x0 = sde.prior_sampling(k_prior, shape)

    # The sequential sampler's exact key chain (sampling.py _scan body:
    # key, k_c, k_p = split(key, 3) per step) — same keys => the Picard
    # fixed point IS the sequential trajectory.
    def key_chain(k, _):
      k, k_c, k_p = jax.random.split(k, 3)
      return k, (k_c, k_p)

    _, (keys_c, keys_p) = jax.lax.scan(key_chain, key, None, length=N)

    def pc_step(x, i, k_c, k_p):
      """One full corrector+predictor step at global step index i."""
      t_vec = jnp.full((shape[0],), timesteps[i])
      nt_vec = jnp.full((shape[0],), next_timesteps[i])
      x, _ = corrector_fn(sde, score_fn, x, t_vec, k_c, snr, n_steps)
      x, x_mean = predictor_fn(
          rsde, x, t_vec, k_p,
          next_t=nt_vec if isinstance(sde, ReciprocalVESDE) else None)
      return x, x_mean

    vstep = jax.vmap(pc_step, in_axes=(0, 0, 0, 0))
    reduce_axes = tuple(range(1, len(shape) + 1))  # all but the window axis

    def run_block(x_in, idx0, w_blk):
      """Picard-iterate steps [idx0, idx0 + w_blk) from entry state x_in.
      w_blk is static. Returns (block output, last-step x_mean, nfe)."""
      idxs = idx0 + jnp.arange(w_blk)
      kc = keys_c[idxs]
      kp = keys_p[idxs]
      X0 = jnp.broadcast_to(x_in, (w_blk,) + tuple(shape))

      def cond(carry):
        _, _, _, err, sweeps = carry
        # NaN err means not-yet-visited window positions exploded (their
        # garbage guesses can overflow in f32 before the exact prefix
        # reaches them) — that is "not converged", NOT "done": the exact
        # prefix still grows >= 1 position per sweep regardless of the
        # tail (position j's cumsum only reads increments i < j), so
        # iterating to max_sweeps_ washes the garbage out. A plain
        # `err > tol` is False for NaN and would exit with garbage.
        not_converged = jnp.logical_or(jnp.isnan(err), err > tol)
        return jnp.logical_and(not_converged, sweeps < max_sweeps_)

      def body(carry):
        X, _, _, _, sweeps = carry
        new_states, new_means = vstep(X, idxs, kc, kp)
        inc = new_states - X
        csum = jnp.cumsum(inc, axis=0)
        # X[0] is pinned to the block entry state; positions j >= 1 get
        # the prefix-summed update (the Picard sweep).
        Xn = jnp.concatenate([X[:1], x_in[None] + csum[:-1]], axis=0)
        err = jnp.max(jnp.sqrt(jnp.mean((Xn - X) ** 2, axis=reduce_axes)))
        out = x_in + csum[-1]
        return Xn, out, new_means[-1], err, sweeps + 1

      init = (X0, x_in, x_in, jnp.asarray(jnp.inf), jnp.asarray(0))
      _, out, mean_last, _, sweeps = jax.lax.while_loop(cond, body, init)
      return out, mean_last, sweeps * w_blk * evals_per_step

    x = x0
    x_mean = x0
    nfe = jnp.asarray(0)
    if n_full:
      def block_body(carry, b):
        x, nfe = carry
        out, mean_last, block_nfe = run_block(x, b * W, W)
        return (out, nfe + block_nfe), mean_last

      (x, nfe), means = jax.lax.scan(block_body, (x, nfe),
                                     jnp.arange(n_full))
      x_mean = means[-1]
    if tail:
      x, x_mean, tail_nfe = run_block(x, n_full * W, tail)
      nfe = nfe + tail_nfe

    # Final denoise to the t=0 mean, identical to get_pc_sampler._finish.
    rsde_d = ReverseSDE(sde, score_fn, probability_flow=True, lambda_=0.0)
    vec_eps = jnp.full((shape[0],), sde.eps)
    f, _ = rsde_d.discretize(x_mean if denoise else x, vec_eps,
                             jnp.zeros_like(vec_eps))
    out = (x_mean if denoise else x) - f
    return inverse_scaler(out), nfe

  return sampler
