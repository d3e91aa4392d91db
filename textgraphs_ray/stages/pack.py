"""Training-data export operators: greedy sequence packing and
deterministic shard assignment.

Both are standard tail-of-pipeline steps for LLM pretraining corpora
(pack documents into fixed-token-budget training rows; route rows to a
fixed set of output shards reproducibly).  The reference has no
equivalent — these extend SURVEY.md §2's inventory on the
training-data side, like ``stages/dedup.py`` and ``stages/text.py``.

Scale notes
-----------
* ``pack_greedy`` packs WITHIN a group (``group_col``): one groupby
  shuffle, then an O(bins·log n) vectorized sweep per group.  Packing
  is inherently order-sequential, so the unit of sequentiality must be
  a bounded group — at 100 TB that means packing per (source, shard),
  never globally; the group key choice is the caller's partitioning
  contract, same as ``sessionize``'s per-user assumption.
* ``shard_assign`` is embarrassingly parallel (hash per row, one
  combiner-backed groupby for the balance report).  The md5 basis makes
  the assignment byte-stable across reruns, block layouts and cluster
  sizes — and SQL-replayable for the oracle gate.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def greedy_bins(lengths: np.ndarray, budget: int) -> np.ndarray:
    """Greedy sequential bin ids for ``lengths`` in the given order.

    Each bin is a maximal run of consecutive items whose sum stays
    ≤ ``budget``; an item longer than the budget occupies its own bin.
    Vectorized over bins: one ``searchsorted`` on the prefix sum per
    emitted bin instead of a per-item Python loop.
    """
    n = len(lengths)
    bins = np.empty(n, dtype=np.int64)
    if n == 0:
        return bins
    cs = np.cumsum(lengths.astype(np.int64))
    start = 0
    b = 0
    while start < n:
        base = cs[start - 1] if start else 0
        end = int(np.searchsorted(cs, base + budget, side="right"))
        if end <= start:  # single item exceeds the budget: own bin
            end = start + 1
        bins[start:end] = b
        b += 1
        start = end
    return bins


def pack_greedy(ds: "ray.data.Dataset", *, budget: int,
                group_col: str = "source", order_col: str = "doc_id",
                len_col: str = "n_chars") -> "ray.data.Dataset":
    """Assign each row a ``bin_id`` by greedy sequential packing of
    ``len_col`` under ``budget``, within each ``group_col`` group in
    ``order_col`` order.  Output: input columns + ``bin_id``."""

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="stable").reset_index(drop=True)
        g["bin_id"] = greedy_bins(g[len_col].to_numpy(), budget)
        return g

    return ds.groupby(group_col).map_groups(pack_group,
                                            batch_format="pandas")


def md5_shard(values: list, n_shards: int) -> np.ndarray:
    """Deterministic shard id per value: first 8 md5 hex digits as an
    integer, mod ``n_shards`` — matches DuckDB's
    ``('0x' || substr(md5(v), 1, 8))::UBIGINT % n``."""
    out = np.empty(len(values), dtype=np.int64)
    for i, v in enumerate(values):
        h = hashlib.md5(str(v).encode()).hexdigest()[:8]
        out[i] = int(h, 16) % n_shards
    return out


def shard_assign(ds: "ray.data.Dataset", *, n_shards: int = 16,
                 key_col: str = "doc_id") -> "ray.data.Dataset":
    """Add a deterministic ``shard`` column (md5 of ``key_col`` mod
    ``n_shards``).  Pair with the resumable partitioned sink
    (``sources/sinks.py``) to route training rows to fixed output
    shards."""

    def assign(t: pa.Table) -> pa.Table:
        shard = md5_shard(t.column(key_col).to_pylist(), n_shards)
        return t.append_column("shard", pa.array(shard, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def interleave_sources(ds: "ray.data.Dataset", *, weights: dict,
                       source_col: str = "source",
                       id_col: str = "doc_id",
                       stop: str = "all_exhausted",
                       plan: str = "group",
                       rank_buckets: int = 256) -> "ray.data.Dataset":
    """Deterministic weighted interleave of per-source streams into one
    global training order → rows + ``pos`` (0-based position in the
    interleaved stream).

    The mixture-shaping step of a pretraining pipeline: emit rows in
    rounds, each round taking ``weights[s]`` rows from every source
    ``s`` (sources cycled in sorted-name order), rows within a source
    ordered by ``md5(id)`` — so a 7:2:1 web/books/code ratio holds in
    every window of the stream, reproducibly across reruns, block
    layouts and cluster sizes.

    ``stop="first_exhausted"`` truncates the stream at the last
    complete schedule round every source can fill (the
    HuggingFace-interleave convention); ``"all_exhausted"`` keeps all
    rows (later rounds thin out as sources drain).

    Physical plan (``plan``, both output-identical):

    * ``"group"`` (default): one groupby(``source_col``) ranks each
      source's rows by digest in a single vectorized reducer — one
      shuffle, but a whole source must fit one worker.  Right whenever
      sources are bounded (≲10^8 rows each).
    * ``"bucket"``: digest-prefix bucketing — rank = per-(source,
      bucket) local rank + a prefix-sum offset from one SMALL
      (n_sources × ``rank_buckets`` rows) count table.  Every ranking
      group is ~1/``rank_buckets`` of a source, so a 70%-of-corpus
      source never lands on one worker; raise ``rank_buckets`` with
      corpus size.  The 10^12-row plan.

    Position arithmetic is then a pure per-row map:
    ``pos = (r // w) * W + offset(s) + r % w`` with ``W = Σ weights``,
    ``offset(s)`` the weight-prefix-sum of sources before ``s``.  SQL
    replays the exact order with one window rank + the same formula.
    """
    srcs = sorted(weights)
    W = sum(weights[s] for s in srcs)
    offs, acc = {}, 0
    for s in srcs:
        offs[s] = acc
        acc += weights[s]

    if plan == "bucket":
        return _interleave_bucketed(
            ds, weights=weights, srcs=srcs, W=W, offs=offs,
            source_col=source_col, id_col=id_col, stop=stop,
            rank_buckets=rank_buckets)
    if plan != "group":
        raise ValueError(f"unknown interleave plan: {plan!r}")

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        s = g[source_col].iloc[0]
        if s not in weights:
            return g.iloc[0:0].assign(pos=pd.Series([], dtype="int64"))
        g = g.copy()
        g["_pri"] = [hashlib.md5(str(k).encode()).hexdigest()
                     for k in g[id_col]]
        g = g.sort_values(["_pri", id_col], kind="stable")
        r = np.arange(len(g), dtype=np.int64)
        w = weights[s]
        g["pos"] = (r // w) * W + offs[s] + r % w
        return g.drop(columns="_pri")

    out = ds.groupby(source_col).map_groups(rank_group,
                                            batch_format="pandas")
    if stop == "first_exhausted":
        # second pass over the input just to size the cutoff — project
        # to the grouping column first so only one column pays the
        # re-read + shuffle (the payload never moves)
        counts = {r[source_col]: r["count()"] for r in
                  ds.select_columns([source_col])
                  .groupby(source_col).count().take_all()}
        rounds = min(counts.get(s, 0) // weights[s] for s in srcs)
        cutoff = rounds * W

        def trunc(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.less(t.column("pos"), cutoff))

        out = out.map_batches(trunc, batch_format="pyarrow")
    return out


def _interleave_bucketed(ds: "ray.data.Dataset", *, weights: dict,
                         srcs: list, W: int, offs: dict,
                         source_col: str, id_col: str, stop: str,
                         rank_buckets: int) -> "ray.data.Dataset":
    """Bucketed-rank physical plan for :func:`interleave_sources`.

    The bucket is a monotone function of the digest's first 4 hex
    chars, so bucket order IS digest order: every row in bucket b
    sorts strictly before every row in bucket b+1, and the global
    rank of a row within its source is (rows of that source in
    earlier buckets) + (local rank inside its (source, bucket)
    group).  The earlier-bucket counts come from one combiner-backed
    groupby whose result is n_sources × rank_buckets rows — driver
    prefix sums, broadcast once.  No group ever holds more than
    ~1/rank_buckets of a source.
    """
    import ray

    known = set(srcs)

    def augment(t: pa.Table) -> pa.Table:
        src = t.column(source_col).to_pylist()
        keep = np.array([s in known for s in src], dtype=bool)
        t = t.filter(pa.array(keep))
        ids = t.column(id_col).to_pylist()
        pri = [hashlib.md5(str(k).encode()).hexdigest() for k in ids]
        bkt = np.array([int(p[:4], 16) * rank_buckets // 65536
                        for p in pri], dtype=np.int64)
        t = t.append_column("_pri", pa.array(pri, pa.string()))
        return t.append_column("_bkt", pa.array(bkt, pa.int64()))

    # consumed twice below (count table + ranking shuffle) — pin once
    # (consume-once doctrine, CLAUDE.md); blocks spill like any others
    aug = ds.map_batches(augment, batch_format="pyarrow").materialize()

    count_rows = (aug.select_columns([source_col, "_bkt"])
                  .groupby([source_col, "_bkt"]).count().take_all())
    per_bucket: dict = {}
    totals: dict = {}
    for r in count_rows:
        per_bucket[(r[source_col], r["_bkt"])] = r["count()"]
        totals[r[source_col]] = totals.get(r[source_col], 0) + r["count()"]
    bucket_offs = {}
    for s in srcs:
        acc = 0
        for b in range(rank_buckets):
            n = per_bucket.get((s, b), 0)
            if n:
                bucket_offs[(s, b)] = acc
            acc += n
    off_ref = ray.put(bucket_offs)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g[source_col].iloc[0]
        b = int(g["_bkt"].iloc[0])
        g = g.sort_values(["_pri", id_col], kind="stable").copy()
        base = ray.get(off_ref)[(s, b)]
        r = base + np.arange(len(g), dtype=np.int64)
        w = weights[s]
        g["pos"] = (r // w) * W + offs[s] + r % w
        return g.drop(columns=["_pri", "_bkt"])

    out = aug.groupby([source_col, "_bkt"]).map_groups(
        rank_bucket, batch_format="pandas")

    if stop == "first_exhausted":
        # cutoff comes for free from the count table — no third pass
        rounds = min(totals.get(s, 0) // weights[s] for s in srcs)
        cutoff = rounds * W

        def trunc(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.less(t.column("pos"), cutoff))

        out = out.map_batches(trunc, batch_format="pyarrow")
    return out
