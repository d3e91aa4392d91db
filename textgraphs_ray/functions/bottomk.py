"""Bottom-k sample sketch: deterministic k-sample per group.

Keep the k DISTINCT values with the smallest md5 digest — a classic
mergeable sketch (the bottom-k / KMV family): the accumulator is ≤ k
(digest, value) pairs, merge is a sorted union truncated to k, and the
result is a uniform-without-replacement sample that is IDENTICAL for
any block layout, cluster size, or arrival order.  Because the
priority is plain md5, a SQL engine reproduces the exact sample
(``ORDER BY md5(v) LIMIT k``), so unlike most sketches this one is
value-checkable against an oracle, not just accuracy-tested.

Complements ``det_sample`` (hash-prefix row filter): that samples a
fixed FRACTION; this samples a fixed COUNT per group.
"""

from __future__ import annotations

import hashlib

from ray.data.aggregate import AggregateFn


def bottomk_agg(col: str, *, k: int = 5,
                alias_name: str | None = None) -> AggregateFn:
    """→ AggregateFn: comma-joined bottom-k-by-md5 distinct values of
    ``col`` (values stringified), ordered by digest."""

    def norm(state) -> set:
        # accumulators round-trip through Arrow between map and reduce,
        # which turns tuples into lists — re-tuple before set ops
        return {tuple(x) for x in state}

    def accumulate_block(state, block):
        import pyarrow as pa

        if isinstance(block, pa.Table):
            vals = block.column(col).to_pylist()
        else:
            vals = block[col].tolist()
        cand = {(hashlib.md5(str(v).encode()).hexdigest(), str(v))
                for v in vals if v is not None}
        return sorted(norm(state) | cand)[:k]

    return AggregateFn(
        init=lambda key: [],
        merge=lambda a, b: sorted(norm(a) | norm(b))[:k],
        accumulate_block=accumulate_block,
        finalize=lambda state: ",".join(v for _, v in state),
        name=alias_name or f"bottomk({col})",
    )
