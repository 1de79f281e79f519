"""Concurrent submission of independent Spark actions.

A validation suite is several independent jobs over the same input
(violation sink, uniqueness checks, drift detection).  Submitted
sequentially, every job's scheduling gaps, driver-side planning, and
straggler tails serialize — a parallelism-invariant cost that grows as a
*fraction* of wall time when executors are added, which directly erodes
N->4N scaling efficiency.  Spark's scheduler accepts jobs from multiple
driver threads and backfills idle task slots across them (FIFO pools
still overlap whenever slots free up), so submitting independent actions
concurrently is the standard fix — on a real cluster this is exactly how
a multi-check pipeline driver keeps 1000 executors busy.

The helper is deliberately tiny: thread-pool the action callables,
propagate the first failure (canceling nothing — Spark jobs already
running are left to finish, matching spark-submit semantics where a
driver exception fails the application after in-flight tasks drain).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Sequence


def run_concurrently(actions: Sequence[Callable[[], object]], max_workers: int | None = None) -> list:
    """Run independent Spark actions from concurrent driver threads.

    Each element of ``actions`` is a zero-arg callable that triggers one or
    more Spark actions (``.write``, ``.collect``, ...).  Returns their
    results in input order.  Raises the first exception encountered (after
    all actions have settled, so no sink is left half-submitted silently).
    """
    if not actions:
        return []
    if len(actions) == 1:
        return [actions[0]()]
    with ThreadPoolExecutor(max_workers=max_workers or len(actions)) as pool:
        futures = [pool.submit(a) for a in actions]
        results, first_err = [], None
        for f in futures:
            try:
                results.append(f.result())
            except Exception as e:  # noqa: BLE001 - propagate after all settle
                results.append(None)
                first_err = first_err or e
        if first_err is not None:
            raise first_err
        return results
