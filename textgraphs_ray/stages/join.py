"""Distributed join operators (SURVEY.md §2.4 J-family plumbing).

Two physical join plans, chosen by the size of the build side:

- :func:`shuffle_join` — both sides large: union + ONE coarse
  hash-partition sort shuffle + vectorized per-partition pandas merge.
  Ray's native hash JOIN loses its schema when a shuffle partition
  comes up empty (repo invariant, CLAUDE.md) — with sparse keys and
  high ``num_partitions`` a join crashes with "No match ... FieldRef".
  Carrying both sides through one bounded-fanout groupby sidesteps the
  empty-partition path entirely: ``map_groups`` only ever sees
  non-empty groups.  This is the join the distributed-closure loop and
  global PageRank ride every round (``cluster.py``, ``rank.py``).

- :func:`broadcast_join` — small build side: ``ray.put`` the build
  table ONCE, then a stateless vectorized ``pc.index_in``/``take``
  lookup inside ``map_batches`` over the probe side.  No shuffle at
  all; the pattern every dimension-table join at 100 TB should use
  (shipping a 25-row nation table through an all-to-all exchange is
  wrong at any scale).

Both preserve input streaming: no driver-side materialization of
either dataset (broadcast_join's build side is an in-memory Arrow
table by contract — the caller decides it is small).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def shuffle_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                 left_on: str, right_on: str, num_partitions: int,
                 project=None, *, how: str = "inner") -> "ray.data.Dataset":
    """Join two large Datasets via union + coarse hash partition +
    per-partition pandas merge (empty-partition-safe; see module doc).

    ``project(merged_df) -> df`` selects/renames output columns
    (default: every column of both sides — including BOTH key columns
    when the names differ, pandas-merge semantics; pass a project to
    drop one).  ``how`` is ``"inner"``, ``"left"``, ``"semi"`` or
    ``"anti"`` (semi/anti emit only left columns: left rows with ≥1 /
    no match).  ``num_partitions`` bounds per-task group size — size it
    ≈ total rows / (rows a worker can merge in memory).
    """
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"how must be 'inner', 'left', 'outer', "
                         f"'semi' or 'anti', got {how!r}")
    lschema = left.schema()
    if lschema is None:          # empty left ⇒ empty join, any `how`
        return left
    rschema = right.schema()
    if rschema is None:
        # Empty right side (a fully-filtered Dataset has no schema).
        # anti: nothing to subtract — left passes through; semi/inner:
        # no key can match — empty output with left's columns.  "left"
        # would need right's column NAMES for the null padding, which
        # an empty schema-less Dataset cannot provide.
        if how == "anti":
            return left
        if how == "outer":
            raise ValueError(
                "shuffle_join(how='outer') needs a right side with a "
                "schema; got an empty schema-less Dataset")
        if how in ("semi", "inner"):
            # limit(0) would drop every block and with it the columns;
            # emit ONE empty Arrow block carrying left's schema
            empty = pa.schema(list(zip(lschema.names,
                                       lschema.types))).empty_table()
            return ray.data.from_arrow(empty)
        raise ValueError(
            "shuffle_join(how='left') needs a right side with a schema; "
            "got an empty schema-less Dataset")
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    allnames = lnames + [c for c in rnames if c not in lnames]

    # Arrow types for null-padding the union's missing columns (left
    # wins on shared names; sides agree on shared columns by contract)
    coltypes = {**dict(zip(rschema.names, rschema.types)),
                **dict(zip(lschema.names, lschema.types))}

    def widen(names: list, key: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            # Arrow out (typed nulls for the other side's columns):
            # the union feeds a groupby sort, and Ray shuffles on
            # pandas blocks run ~2.6× slower than on Arrow blocks
            n = t.num_rows
            cols = {c: (t.column(c) if c in names
                        else pa.nulls(n, type=coltypes[c]))
                    for c in allnames}
            keyarr = t.column(key).to_numpy(zero_copy_only=False)
            cols["_side"] = pa.array(np.full(n, side, np.int8))
            cols["_part"] = pa.array(
                (pd.util.hash_array(np.asarray(keyarr, dtype=object))
                 % num_partitions).astype(np.int32))
            return pa.table(cols)
        return fn

    both = (left.map_batches(widen(lnames, left_on, 0),
                             batch_format="pyarrow")
            .union(right.map_batches(widen(rnames, right_on, 1),
                                     batch_format="pyarrow")))

    def merge(t: pa.Table) -> pa.Table:
        # split sides in ARROW before any pandas hop: the union padded
        # each side's missing columns with typed nulls, and converting
        # an int64-with-nulls column to pandas would widen it to
        # float64 — filtering first leaves each side's own columns
        # null-free, so dtypes survive the merge round-trip
        side = t.column("_side").to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(lnames).to_pandas()
        rt = t.filter(pa.array(side == 1)).select(rnames).to_pandas()
        if how in ("semi", "anti"):
            hit = lt[left_on].isin(rt[right_on].unique())
            m = lt[hit] if how == "semi" else lt[~hit]
        elif left_on == right_on:
            m = lt.merge(rt, on=left_on, how=how)
        else:
            m = lt.merge(rt, left_on=left_on, right_on=right_on,
                         how=how)
        out = project(m) if project is not None else m
        # emit Arrow so downstream union with arrow-block datasets
        # keeps one block type
        return pa.Table.from_pandas(out, preserve_index=False)

    return both.groupby("_part").map_groups(merge, batch_format="pyarrow")


def broadcast_join(probe: "ray.data.Dataset", build: pa.Table, *,
                   on: str, build_on: str | None = None,
                   how: str = "inner",
                   columns: list | None = None) -> "ray.data.Dataset":
    """Join a streaming probe Dataset against a SMALL in-memory build
    table: the build side ships to the object store once (``ray.put``)
    and every batch resolves matches with one vectorized
    ``pc.index_in`` + ``take`` — no shuffle, no per-row Python.

    ``columns`` limits which build columns are appended (default: all
    but the key; the key itself is never appended — pass ``[]`` for a
    pure semi-join that appends nothing).  ``how="left"`` keeps
    unmatched probe rows with null build columns; ``"inner"`` drops
    them.  Duplicate build keys keep the FIRST occurrence (dimension
    tables are unique-keyed by contract — assert upstream if unsure).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    bkey = build_on or on
    if columns is None:
        out_cols = [c for c in build.column_names if c != bkey]
    else:
        missing = [c for c in columns if c not in build.column_names]
        if missing:
            raise ValueError(f"columns not in build table: {missing}")
        out_cols = [c for c in columns if c != bkey]
    build = build.combine_chunks()
    b_ref = ray.put(build.select([bkey] + out_cols))

    def lookup(t: pa.Table) -> pa.Table:
        b = ray.get(b_ref)
        idx = pc.index_in(t.column(on), value_set=b.column(bkey))
        if how == "inner":
            keep = pc.is_valid(idx)
            t = t.filter(keep)
            idx = idx.filter(keep)
        for c in out_cols:
            t = t.append_column(c, pc.take(b.column(c), idx))
        return t

    return probe.map_batches(lookup, batch_format="pyarrow")


def bloom_anti_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                    left_on: str, right_on: str, *,
                    expected: int | None = None, fp_rate: float = 0.01,
                    num_partitions: int = 32) -> "ray.data.Dataset":
    """Exact ANTI JOIN (left rows with no key match in ``right``) where
    BOTH sides are too large to broadcast raw — the 100 TB plan for
    "drop every row whose key appears over there".

    Physical plan:

    1. **Build** a Bloom bitmap over ``right``'s keys as a Dataset
       aggregate (``functions/bloom.py`` — per-block bitmap partials,
       bitwise-OR merge; constant ~1.2 bytes/key at 1% FP regardless of
       key count) and ``ray.put`` it once.
    2. **Pre-filter**: one stateless pass over ``left``; rows whose key
       fails the Bloom test are *definitely* unmatched (no false
       negatives) and are emitted directly — they never enter a
       shuffle.  That is the entire scale win: at a typical 1-10% match
       rate, ~90-99% of the probe side skips the exchange.
    3. **Verify** the small candidate remainder (true matches + ~1%
       false positives) with an exact distributed semi/anti join
       against ``right``'s per-block-distinct keys (:func:`shuffle_join`
       ``how="anti"``), so false positives are winnowed and the output
       is exactly the SQL ``ANTI JOIN`` — the Bloom never changes
       answers, only how many rows pay the shuffle.

    ``expected``: approximate distinct-key count of ``right`` used to
    size the filter (defaults to ``right.count()``, cheap parquet
    metadata for file-backed datasets; pass it explicitly when
    ``right`` is a derived pipeline to avoid executing it twice).
    ``left`` is consumed by two streaming passes (pre-filter branch +
    candidate branch); materialize it first if it is expensive to
    recompute.
    """
    from ..functions.bloom import bloom_agg, bloom_contains, bloom_params

    if expected is None:
        expected = right.count()
    m_bits, k = bloom_params(expected, fp_rate)
    name = f"bloom({right_on})"
    bitmap = right.aggregate(bloom_agg(right_on, m_bits=m_bits, k=k,
                                       alias_name=name))[name]
    bm_ref = ray.put(np.ascontiguousarray(bitmap))

    def split(maybe: bool):
        def fn(t: pa.Table) -> pa.Table:
            bm = ray.get(bm_ref)
            hit = bloom_contains(
                bm, t.column(left_on).to_numpy(zero_copy_only=False), k)
            return t.filter(pa.array(hit if maybe else ~hit))
        return fn

    definite = left.map_batches(split(False), batch_format="pyarrow")
    candidates = left.map_batches(split(True), batch_format="pyarrow")

    def distinct_keys(t: pa.Table) -> pa.Table:
        return pa.table({right_on: pc.unique(t.column(right_on))})

    right_keys = right.select_columns([right_on]).map_batches(
        distinct_keys, batch_format="pyarrow")
    verified = shuffle_join(candidates, right_keys, left_on, right_on,
                            num_partitions, how="anti")
    # pandas→arrow round-trips in the verify path type empty string
    # columns as null; cast back to the probe schema so the union of
    # the two branches keeps one block type
    lschema = pa.schema(list(zip(left.schema().names, left.schema().types)))
    verified = verified.map_batches(
        lambda t: t.cast(lschema) if t.schema != lschema else t,
        batch_format="pyarrow")
    return definite.union(verified)


def range_join(probe: "ray.data.Dataset", build: "ray.data.Dataset", *,
               probe_ts: str, build_ts: str, window: int,
               probe_cols: list[str], build_cols: list[str] | None = None,
               emit: str = "count",
               out_col: str = "n_matches") -> "ray.data.Dataset":
    """Interval join WITHOUT an equi-key: for every probe row, the
    build rows whose timestamp falls in ``(probe_ts − window,
    probe_ts]`` — the one join shape neither ``shuffle_join`` (needs a
    key) nor ``asof_join`` (needs a per-entity partition) covers.

    Blocking is time-bucketing with bucket width = ``window``: a probe
    at ``t`` lands in bucket ``t // window``; a build row at ``s`` is
    replicated to buckets ``s // window`` and ``s // window + 1`` — the
    only two buckets whose probes it can match, so every candidate is
    seen EXACTLY once (no post-join dedup) and the exchange fans out a
    bounded 2×.  Inside each bucket group the build timestamps sort
    once and every probe answers via two vectorized ``searchsorted``
    probes.  Per-task memory is bounded by one window's traffic — at
    web scale pick ``window`` (or sub-bucket a hot window by a salt on
    the build side, merging counts per probe afterwards) so a bucket
    fits a worker.

    ``probe_ts`` / ``build_ts`` must be int64-castable (Arrow
    timestamps are, microseconds); ``window`` is in those units.
    ``emit="count"`` → probe_cols + ``out_col`` (LEFT semantics: every
    probe row appears, zero when nothing matches).  ``emit="pairs"`` →
    probe_cols + build_cols, one row per match (inner semantics).
    """
    if emit not in ("count", "pairs"):
        raise ValueError(f"emit must be 'count' or 'pairs', got {emit!r}")
    if emit == "pairs" and not build_cols:
        raise ValueError("emit='pairs' requires build_cols")
    build_cols = build_cols or []
    w = int(window)
    p_carry = list(probe_cols)
    b_carry = list(build_cols)
    # resolve carried-column Arrow types NOW — the tag UDFs run on
    # workers and must not touch the captured Dataset handles
    pschema = probe.schema()
    bschema = build.schema()
    p_all = dict(zip(pschema.names, pschema.types))
    b_all = dict(zip(bschema.names, bschema.types))
    p_types = {c: p_all[c] for c in p_carry}
    b_types = {c: b_all[c] for c in b_carry}

    def tag_probe(t: pa.Table) -> pa.Table:
        ts = t.column(probe_ts).cast(pa.int64())
        cols = {"_bkt": pc.divide(ts, w), "_role": pa.array(
            np.zeros(len(t), np.int8)), "_ts": ts}
        for c in p_carry:
            cols[f"p_{c}"] = t.column(c)
        for c in b_carry:
            cols[f"b_{c}"] = pa.nulls(len(t), b_types[c])
        return pa.table(cols)

    def tag_build(t: pa.Table) -> pa.Table:
        ts = t.column(build_ts).cast(pa.int64())
        bkt = pc.divide(ts, w)
        parts = []
        for shift in (0, 1):
            cols = {"_bkt": pc.add(bkt, shift), "_role": pa.array(
                np.ones(len(t), np.int8)), "_ts": ts}
            for c in p_carry:
                cols[f"p_{c}"] = pa.nulls(len(t), p_types[c])
            for c in b_carry:
                cols[f"b_{c}"] = t.column(c)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    tagged = (probe.map_batches(tag_probe, batch_format="pyarrow")
              .union(build.map_batches(tag_build, batch_format="pyarrow")))

    # build columns colliding with probe names get the pandas "_2"
    # suffix in pairs output
    bname = {c: (f"{c}_2" if c in p_carry else c) for c in b_carry}
    if emit == "count":
        out_schema = pa.schema([(c, p_types[c]) for c in p_carry]
                               + [(out_col, pa.int64())])
    else:
        out_schema = pa.schema([(c, p_types[c]) for c in p_carry]
                               + [(bname[c], b_types[c])
                                  for c in b_carry])

    def _col(vals, typ: pa.DataType) -> pa.Array:
        # the union pads the other side's columns with nulls, which
        # demotes int64 to float64 in the pandas group view — cast
        # back to the declared probe/build type (values are null-free
        # inside their own role, so the cast is exact)
        arr = pa.array(vals)
        return arr if arr.type == typ else arr.cast(typ)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        pr = g[g["_role"] == 0]
        bl = g[g["_role"] == 1]
        bts = np.sort(bl["_ts"].to_numpy(np.int64))
        pts = pr["_ts"].to_numpy(np.int64)
        hi = np.searchsorted(bts, pts, side="right")
        lo = np.searchsorted(bts, pts - w, side="right")
        if emit == "count":
            cols = [_col(pr[f"p_{c}"].to_numpy(), p_types[c])
                    for c in p_carry]
            cols.append(pa.array((hi - lo).astype(np.int64)))
            return pa.Table.from_arrays(cols, schema=out_schema)
        # pairs: build rows re-ordered to the sorted-ts permutation
        order = np.argsort(bl["_ts"].to_numpy(np.int64), kind="stable")
        counts = hi - lo
        if counts.sum() == 0 or len(pr) == 0:
            return out_schema.empty_table()
        bidx = np.concatenate(
            [np.arange(l, h) for l, h in zip(lo, hi) if h > l])
        cols = [_col(np.repeat(pr[f"p_{c}"].to_numpy(), counts),
                     p_types[c]) for c in p_carry]
        for c in b_carry:
            cols.append(_col(bl[f"b_{c}"].to_numpy()[order][bidx],
                             b_types[c]))
        return pa.Table.from_arrays(cols, schema=out_schema)

    return tagged.groupby("_bkt").map_groups(per_bucket,
                                             batch_format="pandas")


def distinct_set_op(left: "ray.data.Dataset", right: "ray.data.Dataset",
                    cols: list[str], *,
                    op: str = "intersect") -> "ray.data.Dataset":
    """SQL ``INTERSECT`` / ``EXCEPT`` (distinct set semantics) over the
    projection to ``cols`` — the §2.7 set-operator family beyond
    ``union``.

    Per-batch ``drop_duplicates`` is the combiner (at most one row per
    distinct key leaves any block per side), then ONE groupby over
    ``cols`` ORs the per-side presence flags and a stateless scan
    keeps rows present in both (``intersect``) or only in the left
    (``except``).  No driver materialization; the exchange carries
    only distinct keys + two int flags.
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be 'intersect' or 'except', got {op!r}")
    from ray.data.aggregate import Max

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            df = t.select(cols).to_pandas().drop_duplicates()
            df["_l"] = np.int64(1 - side)
            df["_r"] = np.int64(side)
            return pa.Table.from_pandas(df, preserve_index=False)
        return fn

    both = (left.map_batches(tag(0), batch_format="pyarrow")
            .union(right.map_batches(tag(1), batch_format="pyarrow")))
    agg = both.groupby(cols).aggregate(Max("_l", alias_name="_l"),
                                       Max("_r", alias_name="_r"))
    want_r = 1 if op == "intersect" else 0

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t.column("_l"), 1),
                    pc.equal(t.column("_r"), want_r))
        return t.filter(m).select(cols)

    return agg.map_batches(keep, batch_format="pyarrow")


def salted_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                left_on: str, right_on: str, num_partitions: int, *,
                salts: int = 8, project=None,
                how: str = "inner") -> "ray.data.Dataset":
    """:func:`shuffle_join` for SKEWED keys: a hot key (one user is
    70% of events, one token is 7% of a web corpus) lands its whole
    group on ONE reduce task in any plain hash-partition join.  Here
    the left side's rows spread round-robin over ``salts`` sub-keys
    (any assignment yields the identical join output — salting only
    re-partitions the work), the right side replicates each row to all
    ``salts`` sub-keys (bounded ``salts``× fan-out), and the join runs
    on the composite key — so the hot key's work lands on ``salts``
    tasks instead of one.

    Same output contract as :func:`shuffle_join` (``project`` /
    ``how="inner"|"left"|"semi"|"anti"``); when the key columns share
    a name the right copy is dropped before the merge (it always
    equals the left's on matched rows), so output columns match the
    unsalted plan exactly — parity is pinned in tests/test_join.py.
    """
    if salts < 1:
        raise ValueError("salts must be >= 1")

    def tag_left(t: pa.Table) -> pa.Table:
        # Arrow out: shuffle_join reads schema().types to null-pad the
        # union, and a pandas block's numpy dtypes crash pa.nulls on
        # string columns (repo invariant: arrow blocks through shuffles)
        df = t.to_pandas()
        df["_sk"] = (df[left_on].astype(str) + "\x1f"
                     + pd.Series(np.arange(len(df)) % salts,
                                 index=df.index).astype(str))
        return pa.Table.from_pandas(df, preserve_index=False)

    def tag_right(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        reps = []
        for s in range(salts):
            d = df.copy()
            d["_sk"] = d[right_on].astype(str) + "\x1f" + str(s)
            reps.append(d)
        out = pd.concat(reps, ignore_index=True)
        if right_on == left_on:
            out = out.drop(columns=[right_on])
        return pa.Table.from_pandas(out, preserve_index=False)

    def proj2(m: pd.DataFrame) -> pd.DataFrame:
        m = m.drop(columns=["_sk"])
        return project(m) if project is not None else m

    return shuffle_join(
        left.map_batches(tag_left, batch_format="pyarrow"),
        right.map_batches(tag_right, batch_format="pyarrow"),
        "_sk", "_sk", num_partitions, project=proj2, how=how)


def interval_overlap_join(a: "ray.data.Dataset", b: "ray.data.Dataset",
                          *, key: str, id_col: str, start: str,
                          end: str, cell: int,
                          out_a: str = "a_id", out_b: str = "b_id",
                          out_col: str = "overlap"
                          ) -> "ray.data.Dataset":
    """Keyed interval-overlap join: every (a, b) pair sharing ``key``
    with ``a.start <= b.end AND b.start <= a.end`` → (key, a_id,
    b_id, overlap = min(ends) − max(starts)).

    Blocking is a time grid of width ``cell`` per key: each interval
    replicates to every cell it spans (fan-out bounded by
    length/cell + 1 — pick ``cell`` near the typical interval length),
    and a pair is emitted ONLY in its anchor cell, the one containing
    ``max(starts)``.  Every overlapping pair shares that cell (both
    intervals cover max(starts)), so each match is seen exactly once —
    no post-join dedup shuffle.  Inside a (key, cell) group the check
    is one vectorized |A|×|B| mask; per-task memory is bounded by one
    cell's traffic per key — sub-bucket a hot key by salting the cell
    id at web scale.

    ``start``/``end`` must be int64 (same units as ``cell``),
    inclusive endpoints, ``end >= start``.  Extends
    :func:`range_join`'s equi-key-free bucketing to two genuine
    interval sides (reference has no interval operator; this is the
    sessions/spans overlap primitive its event analytics lack).
    """
    c = int(cell)
    if c <= 0:
        raise ValueError(f"cell must be positive, got {cell}")

    def tag(role: int):
        def fn(t: pa.Table) -> pa.Table:
            k = t.column(key).cast(pa.int64())
            i = t.column(id_col).cast(pa.int64())
            s = t.column(start).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            e = t.column(end).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            lo = s // c
            hi = e // c
            reps = (hi - lo + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(s)), reps)
            # cell ids: lo[i] .. hi[i] per interval, flattened
            offs = np.arange(len(idx)) - np.repeat(
                np.cumsum(reps) - reps, reps)
            cells = lo[idx] + offs
            kk = k.to_numpy(zero_copy_only=False)[idx]
            return pa.table({
                "_g": pa.array(kk * (1 << 32) + cells),
                "_c": pa.array(cells),
                "_role": pa.array(np.full(len(idx), role, np.int8)),
                "k": pa.array(kk),
                "i": i.to_numpy(zero_copy_only=False)[idx],
                "s": pa.array(s[idx]),
                "e": pa.array(e[idx])})
        return fn

    tagged = (a.map_batches(tag(0), batch_format="pyarrow")
              .union(b.map_batches(tag(1), batch_format="pyarrow")))
    out_schema = pa.schema([(key, pa.int64()), (out_a, pa.int64()),
                            (out_b, pa.int64()), (out_col, pa.int64())])

    def per_cell(g: pd.DataFrame) -> pa.Table:
        aa = g[g["_role"] == 0]
        bb = g[g["_role"] == 1]
        if len(aa) == 0 or len(bb) == 0:
            return out_schema.empty_table()
        cid = int(g["_c"].iloc[0])
        sa = aa["s"].to_numpy(np.int64)
        ea = aa["e"].to_numpy(np.int64)
        sb = bb["s"].to_numpy(np.int64)
        eb = bb["e"].to_numpy(np.int64)
        anchor = np.maximum(sa[:, None], sb[None, :])
        m = ((sa[:, None] <= eb[None, :]) & (sb[None, :] <= ea[:, None])
             & (anchor // c == cid))
        ai, bi = np.nonzero(m)
        if len(ai) == 0:
            return out_schema.empty_table()
        ov = (np.minimum(ea[ai], eb[bi])
              - np.maximum(sa[ai], sb[bi]))
        return pa.Table.from_arrays(
            [pa.array(aa["k"].to_numpy(np.int64)[ai]),
             pa.array(aa["i"].to_numpy(np.int64)[ai]),
             pa.array(bb["i"].to_numpy(np.int64)[bi]),
             pa.array(ov)], schema=out_schema)

    return tagged.groupby("_g").map_groups(per_cell,
                                           batch_format="pandas")
