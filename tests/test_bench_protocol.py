"""Pin bench.py's codified quiet-host attempt-selection rule
(VERDICT r16 "what's wrong" #1): the committed sidecar's reported run
must be chosen by RULE — quiet-start attempts only (unless none), host
factor closest to probe parity — never the lowest raw total. A
regression here would let a noisy round hand-pick a lucky run again.

Spark-free: select_attempt is a pure function over the recorded
attempt dicts.
"""

import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
)
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)
select_attempt = _bench.select_attempt


def _a(total, hf, quiet=True):
    return {"total": total, "host_factor": hf, "quiet_start": quiet}


def test_quiet_start_attempts_exclude_loud_ones():
    # the loud attempt has the best host factor AND the lowest total —
    # both must lose to the quiet pool
    attempts = [_a(80.0, 1.30), _a(60.0, 1.00, quiet=False), _a(78.0, 1.25)]
    assert select_attempt(attempts) == 2


def test_closest_to_probe_parity_not_lowest_total():
    # attempt 0 is fastest raw; attempt 1 has hf closest to 1 — the
    # rule is parity, not speed
    attempts = [_a(65.0, 0.80), _a(72.0, 1.02), _a(70.0, 1.15)]
    assert select_attempt(attempts) == 1


def test_parity_is_two_sided():
    # |hf - 1| compares symmetrically: 0.97 beats 1.06
    attempts = [_a(70.0, 1.06), _a(75.0, 0.97)]
    assert select_attempt(attempts) == 1


def test_all_loud_falls_back_to_every_attempt():
    attempts = [_a(90.0, 1.40, quiet=False), _a(88.0, 1.20, quiet=False)]
    assert select_attempt(attempts) == 1


def test_single_attempt_is_reported_as_is():
    assert select_attempt([_a(70.0, 1.33, quiet=False)]) == 0


def test_tie_on_parity_keeps_the_earliest_attempt():
    # deterministic on ties: min() keeps the first — re-running cannot
    # reshuffle which attempt a tie reports
    attempts = [_a(70.0, 1.05), _a(69.0, 0.95)]
    assert select_attempt(attempts) == 0
