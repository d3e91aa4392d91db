"""Bounded driver-side collection.

Every driver-kernel plan in this engine (``harmonic_driver``'s CSR
kernel, ``_greedy_driver``'s sequential matching scan,
``jw_distinct_join``'s distinct-name broadcast, the closure's
``_driver_union_find``) collects a Dataset to the driver ONLY under
an explicit row bound — collecting an unbounded table is the one
anti-pattern that cannot be retried at 100 TB.  This helper makes the
guard uniform: count first (cheap on a materialized Dataset), fail
loudly with the caller's hint when the bound is exceeded, and only
then ``take_all``.

Reference parity note: the reference engine holds every structure on
one process unconditionally (``/root/reference/textgraphs/graph.py:37``);
this bound is the distributed replacement for that assumption.
"""

from __future__ import annotations

from typing import Any


def assert_bounded(ds, max_rows: int, hint: str) -> int:
    """Count ``ds`` and raise (with the caller's ``hint``) when it
    exceeds ``max_rows`` — for driver kernels that collect via
    ``iter_batches``/custom paths rather than ``take_all``.  Returns
    the row count so callers can reuse it."""
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"driver-side collect of {n} rows exceeds the "
            f"{max_rows}-row bound — {hint}")
    return n


def collect_bounded(ds, max_rows: int, hint: str) -> list[dict[str, Any]]:
    """``take_all`` a Dataset after asserting it holds at most
    ``max_rows`` rows.

    ``hint`` names the caller's escape hatch (the distributed plan /
    upstream blocking step / bound parameter) so the failure is
    actionable, e.g. ``"use plan='distributed' or raise max_pairs"``.

    Counting consumes the Dataset once — pass a materialized Dataset
    when the upstream is expensive (a lazy input would re-execute for
    the count AND the collect; the repo's consume-twice invariant).
    """
    assert_bounded(ds, max_rows, hint)
    return ds.take_all()
