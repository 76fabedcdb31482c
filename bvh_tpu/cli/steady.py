"""Two-point steady-state timing for chained device programs.

On this tunneled platform one python-level dispatch+readback costs a
FIXED ~100-130 ms regardless of program size (PERFORMANCE.md cost
model), so timing a K-render chain and dividing by K still carries
C/K of host overhead per render — at K=16 on an ~3 ms render that is
a 3x overstatement of the render time (measured round 5: the same
sponza chain reads 11.25 ms/render at K=16 and 5.35 at K=64).

`steady_rate` times chains at two lengths and returns the marginal
per-render time r = (t(k2) - t(k1)) / (k2 - k1) — the pure device
steady-state, the honest analogue of the reference benchmark's
median-of-N on a local machine where dispatch is ~free
(benchmark.cpp:60-71) — plus the fixed overhead C = t(k1) - k1*r so
callers can report both transparently.
"""

from __future__ import annotations

import time


def _median_time(run, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def steady_rate(make_chain, k1: int = 16, k2: int = 64, reps: int = 3):
    """make_chain(k) -> zero-arg callable running a k-chain and
    BLOCKING on its result (e.g. float(chain()[0])).

    Returns (seconds_per_render, fixed_overhead_seconds, t_k1, t_k2).
    """
    assert k2 > k1 >= 1
    c1 = make_chain(k1)
    c2 = make_chain(k2)
    c1()  # compile + warm
    c2()
    t1 = _median_time(c1, reps)
    t2 = _median_time(c2, reps)
    r = (t2 - t1) / (k2 - k1)
    overhead = t1 - k1 * r
    return r, overhead, t1, t2
