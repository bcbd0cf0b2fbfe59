"""steps_per_dispatch window cadence (run_lib._crossed).

A K-step window covers steps [step0, last] in one dispatch; periodic
events (log/snapshot/meta) must fire exactly once per crossed multiple,
labeled with the nominal step, for ANY window width — matching the
classic per-step loop (reference run_lib.py:76-113: ``step % freq == 0``
checks, with step 0 excluded for snapshots but included for logging).
Pure host logic — no devices, runs in milliseconds.
"""

import itertools

from soft_truncation_tpu.run_lib import _crossed


def _classic_events(initial_step, n_iters, freq, allow_zero):
  """The per-step reference cadence: every multiple of freq in range."""
  return [s for s in range(initial_step, n_iters + 1)
          if freq > 0 and s % freq == 0 and (s != 0 or allow_zero)]


def _window_events(initial_step, n_iters, K, freq, allow_zero):
  """Events fired by the windowed loop, with their labels."""
  events = []
  step0 = initial_step
  while step0 <= n_iters:
    w = min(K, n_iters + 1 - step0)
    last = step0 + w - 1
    m = _crossed(step0, last, freq, allow_zero=allow_zero)
    if m is not None:
      events.append(m)
    step0 += w
  return events


def test_window_width_one_is_classic_loop():
  for freq in (1, 2, 3, 7, 50):
    for allow_zero in (False, True):
      assert (_window_events(0, 40, 1, freq, allow_zero)
              == _classic_events(0, 40, freq, allow_zero))


def test_every_multiple_fires_exactly_once_any_window():
  for K, freq, init, n in itertools.product(
      (1, 2, 3, 4, 7, 8, 16), (1, 2, 5, 7, 10), (0, 1, 5, 501), (0, 23, 57)):
    n_iters = init + n
    for allow_zero in (False, True):
      fired = _window_events(init, n_iters, K, freq, allow_zero)
      classic = _classic_events(init, n_iters, freq, allow_zero)
      # windows wider than freq can cross SEVERAL multiples but fire once,
      # labeled with the largest — so fired is a subsequence of classic
      # containing at least one label per disjoint window of K multiples,
      # and always the final multiple.
      assert fired == sorted(set(fired)), (K, freq, init, n_iters)
      assert set(fired) <= set(classic), (K, freq, init, n_iters)
      if classic:
        assert fired and fired[-1] == classic[-1], (K, freq, init, n_iters)
      if K <= freq:
        # a window never spans two multiples: exact per-step semantics
        assert fired == classic, (K, freq, init, n_iters)


def test_zero_or_negative_freq_never_fires():
  assert _crossed(0, 7, 0) is None
  assert _crossed(0, 7, -3) is None


def test_labels_are_in_window_and_on_cadence():
  for K, freq in itertools.product((2, 5, 8), (3, 4, 10)):
    step0 = 0
    while step0 <= 100:
      last = min(step0 + K - 1, 100)
      m = _crossed(step0, last, freq)
      if m is not None:
        assert step0 <= m <= last and m % freq == 0
      step0 = last + 1
