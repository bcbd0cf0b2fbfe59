"""End-to-end train-loop bench: phase timing per steps_per_dispatch window.

Replicates run_lib.train's production loop (host get_batch -> np.stack ->
device_put -> jitted window) on the flagship config with synthetic data,
reporting per-phase host costs and steady-state imgs/s. Companion to the
CLI measurements in benchmarks/e2e_cli.jsonl / ROOFLINE.md "End-to-end
CLI training".

Usage: python tools/bench_e2e_loop.py [K] [rng_impl] [n_steps]
  K         steps per dispatch window (default 1)
  rng_impl  threefry2x32 (default) | unsafe_rbg
  n_steps   timed steps (default 240)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 1
RNG = sys.argv[2] if len(sys.argv) > 2 else "threefry2x32"
NSTEP = int(sys.argv[3]) if len(sys.argv) > 3 else 240
jax.config.update("jax_default_prng_impl", RNG)

from soft_truncation_tpu import data as datasets
from soft_truncation_tpu.losses import get_optimizer
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.parallel import (make_mesh, replicated_sharding,
    stacked_batch_sharding)
from soft_truncation_tpu.sde import get_sde
from soft_truncation_tpu.train import init_train_state, make_multi_train_step
from soft_truncation_tpu.utils.compile_cache import (
    setup_compilation_cache_from_argv)
import importlib.util
spec = importlib.util.spec_from_file_location(
    "cfgmod", "soft_truncation_tpu/configs/vp/CIFAR10/ddpmpp_nll_st.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
config = m.get_config()
config.data.dataset = "Synthetic"
config.training.batch_size = 128
config.optim.num_micro_batch = 1
config.tpu.compute_dtype = "bfloat16"
setup_compilation_cache_from_argv()

sde = get_sde(config); model = create_model(config); tx = get_optimizer(config)
state = init_train_state(jax.random.PRNGKey(0), config, model, tx)
mesh = make_mesh(); rs = replicated_sharding(mesh)
sbs = stacked_batch_sharding(mesh)
# The exact production preprocess (incl. the uint8-transport branch that
# get_batch exercises for Synthetic) — shared with run_lib.train so this
# bench measures the identical program.
window_fn = make_multi_train_step(config, sde, model, tx,
                                  preprocess=datasets.make_preprocess_fn(config))
jitted = jax.jit(window_fn, in_shardings=(rs, sbs, rs),
                 out_shardings=(rs, rs, rs), donate_argnums=(0,))
state = jax.device_put(state, rs)

train_ds, _ = datasets.get_dataset(config)
train_iter = iter(train_ds.as_numpy_iterator())
key = jax.random.PRNGKey(42)

def window():
  raws = []
  global train_iter
  for _ in range(K):
    b, train_iter = datasets.get_batch(config, train_iter, train_ds)
    raws.append(b)
  return np.stack(raws)

t_data = t_put = t_disp = 0.0
NW = max(NSTEP // K, 2)
for i in range(max(2, 16 // K)):  # warmup/compile
  state, key, losses = jitted(state, jax.device_put(window(), sbs), key)
float(losses.mean())
t00 = time.perf_counter()
for i in range(NW):
  t0 = time.perf_counter()
  s = window()
  t1 = time.perf_counter()
  batches = jax.device_put(s, sbs)
  t2 = time.perf_counter()
  state, key, losses = jitted(state, batches, key)
  t3 = time.perf_counter()
  t_data += t1-t0; t_put += t2-t1; t_disp += t3-t2
float(losses.mean())
total = time.perf_counter() - t00
n = NW * K
print(f"K={K} rng={RNG}: total {total/n*1e3:.2f} ms/step -> "
      f"{n*128/total:.0f} imgs/s")
print(f"  per-window: data+stack {t_data/NW*1e3:.1f} ms, device_put "
      f"{t_put/NW*1e3:.1f} ms, dispatch-call {t_disp/NW*1e3:.1f} ms, "
      f"window total {total/NW*1e3:.1f} ms (device-only step ~64 ms x {K})")
