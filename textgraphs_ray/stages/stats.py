"""Per-group feature normalization and threshold filtering.

Two curation-pipeline primitives over a grouped numeric column:

- :func:`group_zscore` — z-score a column within its group (the
  feature-normalization step before mixing quality signals across
  languages/sources: a "short" English doc and a "short" code file sit
  at very different raw lengths).  ONE combiner-fed groupby produces
  per-group ``(n, Σx, Σx²)`` sufficient statistics — constant bytes
  per group — then a stateless broadcast scan standardizes every row.
  For integer columns the sums are EXACT on both engines (int64 here,
  HUGEINT in DuckDB), so mean/σ agree bit-for-bit and the 6dp-rounded
  z-scores hash-match the SQL oracle.  Group keys are bounded
  (languages, sources) by contract — the stats table is broadcast; for
  unbounded keys route it through ``shuffle_join`` on the group column
  (``broadcast_groups_max``).

- :func:`group_quantile_filter` — keep rows at-or-above their group's
  q-quantile of a value column (per-language length/quality floors —
  the Gopher/CCNet "drop the bottom decile per language" rule).  The
  per-group quantile rides the mergeable histogram sketch
  (:func:`..functions.histq.hist_quantile_agg` — deterministic
  floor-bin + rank rule, so the threshold AND the filtered output are
  SQL-reproducible exactly), and the tiny (group → threshold) table
  broadcasts into one stateless filter scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.histq import hist_quantile_agg
from ..functions.rounding import round_half_away
from .join import shuffle_join

#: above this many distinct groups the stats table stops being a
#: driver broadcast and attaches via a hash-partitioned join
BROADCAST_GROUPS_MAX = 100_000


def _group_sums(ds: "ray.data.Dataset", *, value_col: str,
                group_col: str) -> "ray.data.Dataset":
    """→ (group, n, s1, s2) sufficient statistics, combiner-first."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t.column(group_col).to_pandas(),
            "x": t.column(value_col).to_numpy(zero_copy_only=False)})
        agg = df.groupby("g", sort=False)["x"].agg(
            n="count", s1="sum", s2=lambda s: (s * s).sum())
        return pa.table({
            group_col: pa.array(agg.index),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
            "s1": pa.array(agg["s1"].to_numpy(np.int64)),
            "s2": pa.array(agg["s2"].to_numpy(np.int64)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s1", alias_name="s1"),
                       Sum("s2", alias_name="s2")))


def group_zscore(ds: "ray.data.Dataset", *, value_col: str,
                 group_col: str, id_col: str, out_col: str = "z",
                 broadcast_groups_max: int = BROADCAST_GROUPS_MAX,
                 num_partitions: int = 32) -> "ray.data.Dataset":
    """→ (id, group, value, z): population z-score of ``value_col``
    within each ``group_col`` group, 6dp.  σ = 0 groups (constant
    value) emit z = 0.0.  Integer value columns are exactly
    reproducible in SQL — see module doc.
    """
    stats = _group_sums(ds, value_col=value_col,
                        group_col=group_col).materialize()

    def z_of(x: np.ndarray, n: np.ndarray, s1: np.ndarray,
             s2: np.ndarray) -> np.ndarray:
        mean = s1 / n
        var = s2 / n - mean * mean
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(var <= 0, 0.0, (x - mean) / np.sqrt(var))
        # rational when var is a perfect square -> half-away 6dp
        return round_half_away(z, 6)

    if stats.count() <= broadcast_groups_max:
        rows = stats.take_all()
        lut = {r[group_col]: (float(r["n"]), float(r["s1"]),
                              float(r["s2"])) for r in rows}
        ref = ray.put(lut)

        def score(t: pa.Table) -> pd.DataFrame:
            m = ray.get(ref)
            g = t.column(group_col).to_pylist()
            x = t.column(value_col).to_numpy(
                zero_copy_only=False).astype(np.float64)
            n = np.array([m[k][0] for k in g])
            s1 = np.array([m[k][1] for k in g])
            s2 = np.array([m[k][2] for k in g])
            return pd.DataFrame({
                id_col: t.column(id_col).to_pandas(),
                group_col: g,
                value_col: t.column(value_col).to_pandas(),
                out_col: z_of(x, n, s1, s2)})

        return ds.map_batches(score, batch_format="pyarrow")

    # join plan: unbounded group cardinality — attach stats by key
    joined = shuffle_join(
        ds, stats, group_col, group_col, num_partitions,
        project=lambda m: pd.DataFrame({
            id_col: m[id_col], group_col: m[group_col],
            value_col: m[value_col],
            out_col: z_of(m[value_col].to_numpy(np.float64),
                          m["n"].to_numpy(np.float64),
                          m["s1"].to_numpy(np.float64),
                          m["s2"].to_numpy(np.float64))}))
    return joined


def group_quantile_thresholds(ds: "ray.data.Dataset", *, value_col: str,
                              group_col: str, q: float, lo: float,
                              hi: float,
                              nbins: int = 1024) -> "ray.data.Dataset":
    """→ (group, threshold): each group's histogram-sketch q-quantile
    of ``value_col`` (lower bin edge — the deterministic
    ``functions/histq.py`` rule, error ≤ one bin width, exact in SQL).
    """
    return (ds.groupby(group_col)
            .aggregate(hist_quantile_agg(value_col, q=q, lo=lo, hi=hi,
                                         nbins=nbins,
                                         alias_name="threshold")))


def group_quantile_filter(ds: "ray.data.Dataset", *, value_col: str,
                          group_col: str, q: float, lo: float, hi: float,
                          nbins: int = 1024) -> "ray.data.Dataset":
    """Keep rows with ``value_col >= `` their group's q-quantile
    threshold (per-group bottom-tail drop).  The (group → threshold)
    table is sketch-sized by construction and broadcasts once; the
    filter itself is one stateless vectorized scan — no second
    shuffle.
    """
    thr = group_quantile_thresholds(ds, value_col=value_col,
                                    group_col=group_col, q=q, lo=lo,
                                    hi=hi, nbins=nbins).take_all()
    lut = {r[group_col]: float(r["threshold"]) for r in thr}
    ref = ray.put(lut)

    def keep(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        g = t.column(group_col).to_pylist()
        x = t.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        thr_v = np.array([m.get(k, -np.inf) for k in g])
        return t.filter(pa.array(x >= thr_v))

    return ds.map_batches(keep, batch_format="pyarrow")


def class_divergence(ds: "ray.data.Dataset", *, group_col: str,
                     class_col: str) -> pd.DataFrame:
    """→ (group, n_docs, entropy, jsd): each group's class-distribution
    entropy and its Jensen-Shannon divergence from the corpus-wide
    class distribution — the distribution-shift monitor for mixing
    training-data sources (a source whose language mix drifts from the
    corpus shows up as rising JSD).

    The only data-sized work is ONE combiner-fed groupby producing
    per-(group, class) counts; the result is bounded by
    |groups| × |classes| by contract (sources × languages) and the
    entropy/JSD arithmetic runs once over that tiny table.  JSD sums
    over the UNION support: classes absent from a group contribute
    the 0.5·q·ln2 tail exactly as the SQL oracle's cross-join grid
    does.  6dp.
    """
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t.column(group_col).to_pandas(),
            "c": t.column(class_col).to_pandas()})
        agg = (df.groupby(["g", "c"], sort=False)
               .size().reset_index(name="n"))
        return pa.table({group_col: pa.array(agg["g"]),
                         class_col: pa.array(agg["c"]),
                         "n": pa.array(agg["n"].to_numpy(np.int64))})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([group_col, class_col])
              .aggregate(Sum("n", alias_name="n"))
              .take_all())
    df = pd.DataFrame(counts)
    mat = (df.pivot_table(index=group_col, columns=class_col,
                          values="n", aggfunc="sum", fill_value=0)
           .astype(np.float64))
    ns = mat.sum(axis=1).to_numpy()
    p = mat.to_numpy() / ns[:, None]
    q = mat.to_numpy().sum(axis=0)
    q = q / q.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        ent = -np.where(p > 0, p * np.log(p), 0.0).sum(axis=1)
        m = (p + q[None, :]) / 2.0
        jsd = (np.where(p > 0, 0.5 * p * np.log(p / m), 0.0)
               + np.where(q[None, :] > 0,
                          0.5 * q[None, :] * np.log(q[None, :] / m),
                          0.0)).sum(axis=1)
    out = pd.DataFrame({
        group_col: mat.index.to_numpy(),
        "n_docs": ns.astype(np.int64),
        "entropy": np.round(ent, 6),
        "jsd": np.round(jsd, 6)})
    return out.sort_values(group_col, ignore_index=True)


def ntile(ds: "ray.data.Dataset", *, value_col: str, id_col: str,
          k: int, out_col: str = "bucket",
          max_distinct: int = 1_000_000) -> "ray.data.Dataset":
    """→ (id, value, bucket): SQL ``ntile(k) OVER (ORDER BY value,
    id)`` — equi-depth bucketing with the first ``n % k`` buckets one
    row larger, exactly SQL's split.

    Global row numbers without a global sort: per-batch distinct-value
    counts (combiner) → one tiny groupby → broadcast (value → rows
    before it) prefix table.  Rows whose value is UNIQUE get their row
    number from the broadcast alone in a stateless scan — no shuffle
    touches them.  Only TIED values (cnt > 1) ride a
    ``groupby(value)`` whose groups sort their ids locally to break
    the tie — the shuffle is bounded by the tied-row count, not n.
    Value cardinality is guarded by ``max_distinct`` (integer lengths,
    quantized scores); unbounded doubles should use the bucketed
    two-phase rank (``stages/pack.py`` pattern) instead.
    """
    def partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(t.column(value_col).to_numpy(
            zero_copy_only=False), return_counts=True)
        return pa.table({value_col: pa.array(v),
                         "c": pa.array(c.astype(np.int64))})

    dist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(value_col).aggregate(Sum("c", alias_name="c"))
            .take_all())
    if len(dist) > max_distinct:
        raise ValueError(
            f"{len(dist)} distinct values exceed max_distinct="
            f"{max_distinct}; use a bucketed two-phase rank")
    dist.sort(key=lambda r: r[value_col])
    n = sum(r["c"] for r in dist)
    start, cnt = {}, {}
    before = 0
    for r in dist:
        start[r[value_col]] = before
        cnt[r[value_col]] = r["c"]
        before += r["c"]
    ref = ray.put((start, cnt))

    base, rem = divmod(n, k)

    def bucket_of(rn: np.ndarray) -> np.ndarray:
        # SQL ntile: first `rem` buckets hold base+1 rows
        pivot = rem * (base + 1)
        big = (rn - 1) // (base + 1) + 1
        small = rem + (rn - 1 - pivot) // max(base, 1) + 1
        return np.where(rn <= pivot, big, small).astype(np.int64)

    def unique_rows(t: pa.Table) -> pd.DataFrame:
        st, ct = ray.get(ref)
        v = t.column(value_col).to_pylist()
        mask = np.array([ct[x] == 1 for x in v], dtype=bool)
        rn = np.array([st[x] + 1 for x in v], np.int64)[mask]
        return pd.DataFrame({
            id_col: t.column(id_col).to_pandas()[mask],
            value_col: t.column(value_col).to_pandas()[mask],
            out_col: bucket_of(rn)})

    def tied_rows(t: pa.Table) -> pa.Table:
        _, ct = ray.get(ref)
        v = t.column(value_col).to_pylist()
        mask = pa.array([ct[x] > 1 for x in v])
        return t.filter(mask)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        st, _ = ray.get(ref)
        g = g.sort_values(id_col, kind="stable")
        rn = (st[g[value_col].iloc[0]]
              + np.arange(1, len(g) + 1, dtype=np.int64))
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            value_col: g[value_col].to_numpy(),
            out_col: bucket_of(rn)})

    uniq = ds.map_batches(unique_rows, batch_format="pyarrow")
    tied = (ds.map_batches(tied_rows, batch_format="pyarrow")
            .groupby(value_col)
            .map_groups(rank_group, batch_format="pandas"))
    return uniq.union(tied)


def grouped_ntile(ds: "ray.data.Dataset", *, value_col: str,
                  id_col: str, group_col: str, k: int,
                  out_col: str = "bucket",
                  max_distinct: int = 1_000_000) -> "ray.data.Dataset":
    """→ (group, id, value, bucket): SQL ``ntile(k) OVER (PARTITION BY
    group ORDER BY value, id)`` — :func:`ntile`'s plan generalized to
    per-group bucket arithmetic.  The broadcast prefix table is keyed
    by (group, value) and per-group row counts drive each group's
    (base, rem) split; only tied (group, value) rows ride a shuffle.
    Distinct (group, value) pairs are bounded by ``max_distinct`` —
    the same broadcast contract as :func:`ntile`."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"g": t.column(group_col).to_pandas(),
                           "v": t.column(value_col).to_pandas()})
        c = (df.groupby(["g", "v"], sort=False).size()
             .reset_index(name="c"))
        return pa.table({group_col: pa.array(c["g"]),
                         value_col: pa.array(c["v"]),
                         "c": pa.array(c["c"].to_numpy()
                                       .astype(np.int64))})

    dist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, value_col])
            .aggregate(Sum("c", alias_name="c")).take_all())
    if len(dist) > max_distinct:
        raise ValueError(
            f"{len(dist)} distinct (group, value) pairs exceed "
            f"max_distinct={max_distinct}; bucket the value domain")
    dist.sort(key=lambda r: (r[group_col], r[value_col]))
    start: dict = {}
    cnt: dict = {}
    n_g: dict = {}
    for r in dist:
        gv = (r[group_col], r[value_col])
        start[gv] = n_g.get(r[group_col], 0)
        cnt[gv] = r["c"]
        n_g[r[group_col]] = start[gv] + r["c"]
    split = {g: divmod(n, k) for g, n in n_g.items()}
    ref = ray.put((start, cnt, split))

    def bucket_of(rn: np.ndarray, base: np.ndarray,
                  rem: np.ndarray) -> np.ndarray:
        pivot = rem * (base + 1)
        big = (rn - 1) // (base + 1) + 1
        small = rem + (rn - 1 - pivot) // np.maximum(base, 1) + 1
        return np.where(rn <= pivot, big, small).astype(np.int64)

    def finish(gs, ids, vs, rn) -> pa.Table:
        _, _, sp = ray.get(ref)
        base = np.array([sp[g][0] for g in gs], np.int64)
        rem = np.array([sp[g][1] for g in gs], np.int64)
        return pa.table({group_col: pa.array(gs),
                         id_col: pa.array(ids),
                         value_col: pa.array(vs),
                         out_col: pa.array(bucket_of(rn, base, rem))})

    def unique_rows(t: pa.Table) -> pa.Table:
        st, ct, _ = ray.get(ref)
        gs = t.column(group_col).to_pylist()
        vs = t.column(value_col).to_pylist()
        mask = np.array([ct[(g, v)] == 1 for g, v in zip(gs, vs)],
                        dtype=bool)
        rn = np.array([st[(g, v)] + 1 for g, v in zip(gs, vs)],
                      np.int64)[mask]
        ids = t.column(id_col).to_pandas()[mask].to_numpy()
        gs = np.array(gs, dtype=object)[mask].tolist()
        vs = t.column(value_col).to_pandas()[mask].to_numpy()
        return finish(gs, ids, vs, rn)

    def tied_rows(t: pa.Table) -> pa.Table:
        _, ct, _ = ray.get(ref)
        gs = t.column(group_col).to_pylist()
        vs = t.column(value_col).to_pylist()
        mask = pa.array([ct[(g, v)] > 1 for g, v in zip(gs, vs)])
        return t.filter(mask)

    def rank_group(g: pd.DataFrame) -> pa.Table:
        st, _, _ = ray.get(ref)
        g = g.sort_values(id_col, kind="stable")
        key = (g[group_col].iloc[0], g[value_col].iloc[0])
        rn = st[key] + np.arange(1, len(g) + 1, dtype=np.int64)
        return finish(g[group_col].tolist(), g[id_col].to_numpy(),
                      g[value_col].to_numpy(), rn)

    uniq = ds.map_batches(unique_rows, batch_format="pyarrow")
    tied = (ds.map_batches(tied_rows, batch_format="pyarrow")
            .groupby([group_col, value_col])
            .map_groups(rank_group, batch_format="pandas"))
    return uniq.union(tied)


def percent_rank(ds: "ray.data.Dataset", *, value_col: str, id_col: str,
                 out_col: str = "pr",
                 max_distinct: int = 1_000_000) -> "ray.data.Dataset":
    """→ (id, value, pr): SQL ``percent_rank() OVER (ORDER BY value)``
    — ``(rank − 1) / (n − 1)`` with ties sharing the min rank, 6dp.

    The value DISTRIBUTION, not the data, is what moves: per-batch
    distinct-value counts (``np.unique`` combiner) → one groupby-sum →
    a (value → rank) table bounded by value cardinality
    (``max_distinct`` guard — integer lengths, quantized scores), then
    prefix-summed once and broadcast into a stateless scan.  rank and
    n are exact integers on both engines, so the rounded quotient is
    bit-parity with the SQL oracle.  For unbounded-cardinality doubles
    use the bucketed two-phase rank (``stages/pack.py`` bucket-offset
    pattern) instead.
    """
    def partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(t.column(value_col).to_numpy(
            zero_copy_only=False), return_counts=True)
        return pa.table({value_col: pa.array(v),
                         "c": pa.array(c.astype(np.int64))})

    dist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(value_col).aggregate(Sum("c", alias_name="c"))
            .take_all())
    if len(dist) > max_distinct:
        raise ValueError(
            f"{len(dist)} distinct values exceed max_distinct="
            f"{max_distinct}; use a bucketed two-phase rank")
    dist.sort(key=lambda r: r[value_col])
    n = sum(r["c"] for r in dist)
    rank = {}
    before = 0
    for r in dist:
        rank[r[value_col]] = before + 1
        before += r["c"]
    ref = ray.put((rank, n))

    def score(t: pa.Table) -> pd.DataFrame:
        rk, total = ray.get(ref)
        v = t.column(value_col).to_pylist()
        r = np.array([rk[x] for x in v], np.float64)
        # integer ratio -> half-away 6dp (repo invariant)
        pr = (np.zeros(len(v)) if total <= 1
              else round_half_away((r - 1.0) / (total - 1.0), 6))
        return pd.DataFrame({
            id_col: t.column(id_col).to_pandas(),
            value_col: t.column(value_col).to_pandas(),
            out_col: pr})

    return ds.map_batches(score, batch_format="pyarrow")


def group_corr(ds: "ray.data.Dataset", *, x_col: str, y_col: str,
               group_col: str) -> "ray.data.Dataset":
    """→ (group, n, corr): exact Pearson correlation of two INTEGER
    columns per group, 6dp.  Like :func:`group_zscore`, the plan is
    one combiner-fed groupby of integer sufficient statistics
    (n, Σx, Σy, Σx², Σy², Σxy) — constant bytes per group, exact on
    both engines (int64 here, HUGEINT in DuckDB) — so the final
    float64 formula is bit-parity with the SQL oracle.  Scale a
    fixed-decimal column to integer units upstream (cents, not
    dollars): correlation is invariant under linear rescaling.
    Degenerate groups (σ = 0 on either side) emit corr = 0.0.
    """
    def partial(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        df = pd.DataFrame({"g": t.column(group_col).to_pandas(),
                           "x": x, "y": y, "xx": x * x, "yy": y * y,
                           "xy": x * y})
        agg = df.groupby("g", sort=False).agg(
            n=("x", "count"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), syy=("yy", "sum"), sxy=("xy", "sum"))
        return pa.table({
            group_col: pa.array(agg.index),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
            "sx": pa.array(agg["sx"].to_numpy(np.int64)),
            "sy": pa.array(agg["sy"].to_numpy(np.int64)),
            "sxx": pa.array(agg["sxx"].to_numpy(np.int64)),
            "syy": pa.array(agg["syy"].to_numpy(np.int64)),
            "sxy": pa.array(agg["sxy"].to_numpy(np.int64))})

    stats = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(group_col)
             .aggregate(Sum("n", alias_name="n"),
                        Sum("sx", alias_name="sx"),
                        Sum("sy", alias_name="sy"),
                        Sum("sxx", alias_name="sxx"),
                        Sum("syy", alias_name="syy"),
                        Sum("sxy", alias_name="sxy")))

    def finish(t: pa.Table) -> pd.DataFrame:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sx = t.column("sx").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sy = t.column("sy").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False).astype(
            np.float64)
        syy = t.column("syy").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False).astype(
            np.float64)
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where((vx <= 0) | (vy <= 0), 0.0,
                         cov / np.sqrt(vx * vy))
        return pd.DataFrame({
            group_col: t.column(group_col).to_pandas(),
            "n": t.column("n").to_pandas(),
            # rational with perfect-square variances -> half-away
            "corr": round_half_away(r, 6)})

    return stats.map_batches(finish, batch_format="pyarrow")


def group_mad_outliers(ds: "ray.data.Dataset", *, value_col: str,
                       group_col: str,
                       z: float = 3.0) -> "ray.data.Dataset":
    """→ (group, med, mad, n_outliers): per-group robust outlier
    census — median, median-absolute-deviation, and how many rows sit
    beyond ``z`` MADs (the robust alternative to
    :func:`group_zscore`'s mean/σ, immune to the very outliers being
    hunted).

    Exact order statistics need the group's values in one place: ONE
    ``groupby(group)`` shuffle, with median, MAD and the count
    computed vectorized inside each group — the
    ``median_agg``/``p90_agg`` contract (a group must fit a worker;
    above that, switch to the mergeable histogram sketch
    ``functions/histq.py`` and trade exactness for a bin-width
    bound).  Medians average the two middles exactly as SQL's
    ``median`` does, so every output is hash-parity.
    """
    def mad_of(g: pd.DataFrame) -> pd.DataFrame:
        x = g[value_col].to_numpy(np.float64)
        med = np.median(x)
        ad = np.abs(x - med)
        mad = np.median(ad)
        return pd.DataFrame({
            group_col: [g[group_col].iloc[0]],
            "med": [med], "mad": [mad],
            "n_outliers": np.array([(ad > z * mad).sum()], np.int64)})

    return ds.groupby(group_col).map_groups(mad_of,
                                            batch_format="pandas")


def selection_quantile(ds_fn, *, value_col: str, q: float,
                       lo: int, hi: int,
                       max_rounds: int = 64) -> pd.DataFrame:
    """→ one row (n, k, value): the EXACT q-quantile (SQL
    ``quantile_disc`` — the element at 1-based rank ``ceil(n·q)``) of
    an integer column by distributed selection, for columns whose
    value cardinality is too large for :func:`percent_rank`'s
    broadcast histogram and where the histogram sketch's bin-width
    error is unacceptable.

    Binary search on the VALUE domain ``[lo, hi]``: each round is one
    stateless filtered count — O(log(hi−lo)) cheap scans total, no
    shuffle, no materialized sort, constant driver memory.
    ``ds_fn()`` must return a fresh (lazy) Dataset per call — a
    ``read_parquet`` with column pruning — because each round
    re-consumes it; at 10^12 rows re-scanning with predicate pushdown
    beats pinning the input (the consume-once invariant applies to
    MATERIALIZED upstreams, not cheap re-reads).
    """
    import math

    n = ds_fn().count()
    if n == 0:
        return pd.DataFrame({"n": np.array([0], np.int64),
                             "k": np.array([0], np.int64),
                             "value": np.array([0], np.int64)})
    k = max(1, math.ceil(n * q))
    a, b = int(lo), int(hi)
    for _ in range(max_rounds):
        if a >= b:
            break
        mid = (a + b) // 2
        c = ds_fn().filter(expr=f"{value_col} <= {mid}").count()
        if c >= k:
            b = mid
        else:
            a = mid + 1
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "k": np.array([k], np.int64),
                         "value": np.array([a], np.int64)})


def selection_order_stat(ds_fn, *, value_col: str, k: int, lo: int,
                         hi: int, max_rounds: int = 64) -> int:
    """The 1-based k-th order statistic of an integer column by the
    same value-domain binary search as :func:`selection_quantile` —
    O(log(hi−lo)) stateless filtered counts, no shuffle, no sort."""
    a, b = int(lo), int(hi)
    for _ in range(max_rounds):
        if a >= b:
            break
        mid = (a + b) // 2
        c = ds_fn().filter(expr=f"{value_col} <= {mid}").count()
        if c >= k:
            b = mid
        else:
            a = mid + 1
    return a


def percentile_cont_exact(ds_fn, *, value_col: str, q: float,
                          lo: int, hi: int) -> pd.DataFrame:
    """→ one row (n, p): ANSI ``percentile_cont(q)`` — the LINEARLY
    INTERPOLATED quantile (DuckDB ``quantile_cont``) of an integer
    column, exactly, via at most two distributed order-statistic
    selections: rank r = q·(n−1) (0-based), p = v_⌊r⌋·(1−f) + v_⌊r⌋₊₁·f
    with f = r − ⌊r⌋ — the same two-sided weighting DuckDB applies,
    so parity holds to the last ulp or two (outputs are 6dp-rounded
    by callers).  Same unbounded-cardinality scaling story as
    :func:`selection_quantile`."""
    import math

    n = ds_fn().count()
    if n == 0:
        return pd.DataFrame({"n": np.array([0], np.int64),
                             "p": np.array([0.0])})
    r = q * (n - 1)
    fl = math.floor(r)
    f = r - fl
    v1 = selection_order_stat(ds_fn, value_col=value_col, k=fl + 1,
                              lo=lo, hi=hi)
    if f == 0.0 or fl + 2 > n:
        p = float(v1)
    else:
        v2 = selection_order_stat(ds_fn, value_col=value_col,
                                  k=fl + 2, lo=lo, hi=hi)
        p = v1 * (1 - f) + v2 * f
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "p": np.array([p])})


def welch_t_pairs(ds: "ray.data.Dataset", *, value_col: str,
                  group_col: str,
                  max_groups: int = 10_000) -> pd.DataFrame:
    """→ (g_a, g_b, n_a, n_b, t_stat, df) for every group pair
    g_a < g_b: Welch's unequal-variance t statistic and its
    Welch–Satterthwaite degrees of freedom — the "did this source's
    doc-length distribution shift?" test that doesn't assume equal
    variances.  ``value_col`` must be integral: per-group (n, Σx, Σx²)
    sufficient statistics reduce through ONE combiner-fed groupby as
    exact int64 (SQL: HUGEINT), so every downstream double is computed
    from identical integers on both engines — the anova_f precedent.
    The k(k−1)/2 pair loop runs on the driver over the bounded group
    census (``max_groups`` guard); the data passes ONCE."""
    stats = _group_sums(ds, value_col=value_col, group_col=group_col)
    rows = sorted(stats.take_all(), key=lambda r: r[group_col])
    if len(rows) > max_groups:
        raise ValueError(f"{len(rows)} groups exceed max_groups="
                         f"{max_groups}")

    def var_mean(r) -> tuple[float, float]:
        n, s1, s2 = r["n"], r["s1"], r["s2"]
        # float op order mirrors the SQL text exactly
        v = (float(s2) - float(s1 * s1) / n) / (n - 1)
        return v, float(s1) / n

    ga, gb, na, nb, ts, dfs = [], [], [], [], [], []
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            if a["n"] < 2 or b["n"] < 2:
                continue
            va_, ma = var_mean(a)
            vb_, mb = var_mean(b)
            se2 = va_ / a["n"] + vb_ / b["n"]
            if se2 <= 0:
                continue
            t = (ma - mb) / np.sqrt(se2)
            df = (se2 * se2) / (
                (va_ / a["n"]) * (va_ / a["n"]) / (a["n"] - 1)
                + (vb_ / b["n"]) * (vb_ / b["n"]) / (b["n"] - 1))
            ga.append(a[group_col])
            gb.append(b[group_col])
            na.append(a["n"])
            nb.append(b["n"])
            ts.append(round(float(t), 6))
            dfs.append(round(float(df), 6))
    return pd.DataFrame({
        "g_a": ga, "g_b": gb,
        "n_a": np.array(na, np.int64), "n_b": np.array(nb, np.int64),
        "t_stat": np.array(ts), "df": np.array(dfs)})


def ks_pairs(ds: "ray.data.Dataset", *, value_col: str,
             group_col: str,
             max_cells: int = 2_000_000) -> pd.DataFrame:
    """→ (g_a, g_b, n_a, n_b, ks, at_v) for every group pair
    g_a < g_b: the exact two-sample Kolmogorov–Smirnov statistic
    max_v |F_a(v) − F_b(v)| over the empirical CDFs of ``value_col``,
    plus the smallest value attaining it — the distribution-shift
    detector behind "did the crawl's length profile drift this
    snapshot?".  ONE combiner-fed (value, group) count groupby is the
    only pass over the data; the driver folds the bounded
    (ndv × groups ≤ ``max_cells``) census with EXACT integer
    cross-differences |c_a·n_b − c_b·n_a| (ties in the max broken by
    smallest value, deterministically), dividing once at the end —
    bit-parity with the SQL window replay."""
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "v": t.column(value_col).to_numpy(zero_copy_only=False),
            "g": t.column(group_col).to_pandas()})
        agg = (df.groupby(["v", "g"], sort=False).size()
               .reset_index(name="c"))
        return pa.table({"v": pa.array(agg["v"].to_numpy(np.int64)),
                         "g": pa.array(agg["g"]),
                         "c": pa.array(agg["c"].to_numpy(np.int64))})

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["v", "g"]).aggregate(_Sum("c", alias_name="c"))
             .take_all())
    if len(cells) > max_cells:
        raise ValueError(f"{len(cells)} (value, group) cells exceed "
                         f"max_cells={max_cells}")
    piv: dict = {}
    totals: dict = {}
    for r in cells:
        piv.setdefault(r["v"], {})[r["g"]] = r["c"]
        totals[r["g"]] = totals.get(r["g"], 0) + r["c"]
    groups = sorted(totals)
    values = sorted(piv)
    cum = {g: np.cumsum([piv[v].get(g, 0) for v in values])
           for g in groups}
    ga, gb, na, nb, ks, atv = [], [], [], [], [], []
    for i, a in enumerate(groups):
        for b in groups[i + 1:]:
            num = np.abs(cum[a] * totals[b] - cum[b] * totals[a])
            best = int(num.max())
            at = values[int(np.argmax(num))]   # first max ⇒ min value
            ga.append(a)
            gb.append(b)
            na.append(totals[a])
            nb.append(totals[b])
            ks.append(round(float(best) / float(totals[a] * totals[b]),
                            6))
            atv.append(at)
    return pd.DataFrame({
        "g_a": ga, "g_b": gb,
        "n_a": np.array(na, np.int64), "n_b": np.array(nb, np.int64),
        "ks": np.array(ks), "at_v": np.array(atv, np.int64)})


def gini_group(ds: "ray.data.Dataset", *, value_col: str,
               group_col: str) -> "ray.data.Dataset":
    """→ (group, n, gini): the Gini concentration coefficient of a
    non-negative integral ``value_col`` within each group — the
    "is this source's size distribution dominated by a few giant
    docs?" inequality gauge.  ONE groupby shuffle; inside each group a
    vectorized ascending sort feeds the exact integer identity
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) — the rank-weighted sum is
    tie-invariant (equal values contribute x·Σi whatever their
    order), so the statistic is deterministic and the SQL
    row_number() replay is bit-parity.  Groups must individually fit
    a worker (the map_groups contract); the rank weighting never
    leaves the group."""

    def fold(g: pd.DataFrame) -> pa.Table:
        x = np.sort(g[value_col].to_numpy(np.int64))
        n = len(x)
        sx = int(x.sum())
        if n and int(x.max()) > (2 ** 62) // n:
            # numpy int64 would wrap where SQL HUGEINT doesn't —
            # exact arbitrary-precision fallback for huge values
            six = sum((i + 1) * int(val) for i, val in enumerate(x))
        else:
            six = int((np.arange(1, n + 1, dtype=np.int64) * x).sum())
        if n == 0 or sx == 0:
            gini = 0.0
        else:
            gini = float(2 * six - (n + 1) * sx) / (float(n) * float(sx))
        return pa.table({
            "grp": pa.array([g[group_col].iloc[0]]),
            "n": pa.array([n], pa.int64()),
            "gini": pa.array([round(gini, 6)], pa.float64())})

    return (ds.groupby(group_col)
            .map_groups(fold, batch_format="pandas"))


def skew_kurt_group(ds: "ray.data.Dataset", *, value_col: str,
                    group_col: str) -> "ray.data.Dataset":
    """→ (group, n, skew, kurt): population skewness and EXCESS
    kurtosis per group from exact int64 power sums (n, Σx, Σx², Σx³,
    Σx⁴) — one combiner-fed groupby is the only shuffle; the float
    finish touches G rows.  Central moments via the raw-moment
    expansion, skew = m3/√(m2³) (sqrt, not pow — IEEE-correctly
    rounded on both engines), kurt = m4/m2² − 3; every float op
    mirrors the SQL replay's expression tree term by term, so the 6dp
    rounding is bit-stable.  Values must be integers small enough
    that Σx⁴ fits int64 (|x| ≤ 55k at a billion rows/group)."""

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"g": t.column(group_col).to_pandas(),
                           "x": x, "x2": x * x, "x3": x * x * x,
                           "x4": (x * x) * (x * x)})
        agg = df.groupby("g", sort=False).agg(
            n=("x", "count"), s1=("x", "sum"), s2=("x2", "sum"),
            s3=("x3", "sum"), s4=("x4", "sum"))
        return pa.table({
            group_col: pa.array(agg.index),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
            "s1": pa.array(agg["s1"].to_numpy(np.int64)),
            "s2": pa.array(agg["s2"].to_numpy(np.int64)),
            "s3": pa.array(agg["s3"].to_numpy(np.int64)),
            "s4": pa.array(agg["s4"].to_numpy(np.int64))})

    sums = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s1", alias_name="s1"),
                       Sum("s2", alias_name="s2"),
                       Sum("s3", alias_name="s3"),
                       Sum("s4", alias_name="s4")))

    def finish(t: pa.Table) -> pa.Table:
        import math
        gs = t.column(group_col).to_pylist()
        n = t.column("n").to_numpy(zero_copy_only=False)
        s1 = t.column("s1").to_numpy(zero_copy_only=False)
        s2 = t.column("s2").to_numpy(zero_copy_only=False)
        s3 = t.column("s3").to_numpy(zero_copy_only=False)
        s4 = t.column("s4").to_numpy(zero_copy_only=False)
        sk, ku = [], []
        for i in range(len(gs)):
            # scalar math, parenthesized EXACTLY like the SQL oracle
            nn = float(n[i])
            mean = s1[i] / nn
            m2 = s2[i] / nn - mean * mean
            m3 = (s3[i] / nn - 3.0 * mean * (s2[i] / nn)
                  + 2.0 * ((mean * mean) * mean))
            m4 = (s4[i] / nn - 4.0 * mean * (s3[i] / nn)
                  + 6.0 * (mean * mean) * (s2[i] / nn)
                  - 3.0 * ((mean * mean) * (mean * mean)))
            # kurt = m4/m2² − 3 is an integer-ratio chain ⇒ can land
            # on a dyadic 6dp tie where Python round() banker-rounds
            # but DuckDB rounds half away; skew's sqrt leg is
            # irrational so ties can't occur, but half-away is then
            # identical — route both through the DuckDB-parity helper.
            sk.append(float(round_half_away(
                m3 / math.sqrt((m2 * m2) * m2), 6)))
            ku.append(float(round_half_away(
                m4 / (m2 * m2) - 3.0, 6)))
        return pa.table({group_col: pa.array(gs),
                         "n": pa.array(n),
                         "skew": pa.array(sk, pa.float64()),
                         "kurt": pa.array(ku, pa.float64())})

    return sums.map_batches(finish, batch_format="pyarrow")


def entropy_group(ds: "ray.data.Dataset", *, class_col: str,
                  group_col: str) -> "ray.data.Dataset":
    """→ (group, n, entropy): Shannon entropy (bits) of the class
    distribution within each group.  One (group, class) count groupby
    (combiner-first) + one per-group fold; the fold sums
    −(c/n)·log2(c/n) in CLASS-ASCENDING order so the float
    accumulation order matches the SQL replay's ordered aggregate."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"g": t.column(group_col).to_pandas(),
                           "c": t.column(class_col).to_pandas()})
        agg = (df.groupby(["g", "c"], sort=False).size()
               .reset_index(name="k"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["g", "c"]).aggregate(Sum("k", alias_name="k")))

    def fold(g: pd.DataFrame) -> pa.Table:
        import math
        g = g.sort_values("c", kind="stable")
        n = int(g["k"].sum())
        h = 0.0
        for k in g["k"].to_numpy(np.int64):
            p = k / float(n)
            h = h - p * math.log2(p)
        return pa.table({"g": pa.array([g["g"].iloc[0]]),
                         "n": pa.array([n], pa.int64()),
                         "entropy": pa.array([round(h, 6)],
                                             pa.float64())})

    return counts.groupby("g").map_groups(fold, batch_format="pandas")


def adjusted_rand(ds: "ray.data.Dataset", *, a_col: str,
                  b_col: str) -> "ray.data.Dataset":
    """→ one row (n, sum_nij, sum_ai, sum_bj, ari): the pair-counting
    Adjusted Rand Index between two label columns over the same rows
    (Hubert & Arabie 1985, public).  The contingency table comes from
    ONE combiner-fed (a, b) count groupby; marginals and the C(·,2)
    sums fold on the driver as exact integers — the only float is the
    final index, whose expression tree mirrors the SQL replay."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"a": t.column(a_col).to_pandas(),
                           "b": t.column(b_col).to_pandas()})
        agg = (df.groupby(["a", "b"], sort=False).size()
               .reset_index(name="k"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(Sum("k", alias_name="k"))
             .take_all())  # bounded: |A-classes| × |B-classes| cells
    kij = np.array([r["k"] for r in cells], np.int64)
    df = pd.DataFrame({"a": [r["a"] for r in cells],
                           "b": [r["b"] for r in cells], "k": kij})
    n = int(kij.sum())
    ai = df.groupby("a")["k"].sum().to_numpy(np.int64)
    bj = df.groupby("b")["k"].sum().to_numpy(np.int64)
    sum_nij = int((kij * (kij - 1) // 2).sum())
    sum_ai = int((ai * (ai - 1) // 2).sum())
    sum_bj = int((bj * (bj - 1) // 2).sum())
    npairs = n * (n - 1) // 2
    # float finish mirrored against the oracle term by term
    expected = (sum_ai * sum_bj) / float(npairs)
    maxi = (sum_ai + sum_bj) / 2.0
    # integer-ratio chain ⇒ dyadic 6dp ties possible; DuckDB rounds
    # half away where Python round() banker-rounds
    ari = float(round_half_away(
        (sum_nij - expected) / (maxi - expected), 6))
    return ray.data.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "sum_nij": pa.array([sum_nij], pa.int64()),
        "sum_ai": pa.array([sum_ai], pa.int64()),
        "sum_bj": pa.array([sum_bj], pa.int64()),
        "ari": pa.array([ari], pa.float64())}))


def grouped_order_stats(ds_fn, *, value_col: str, group_col: str,
                        ranks: dict, lo: int, hi: int,
                        weight_col: str | None = None,
                        max_rounds: int = 64) -> dict:
    """→ {(group, k): value}: the 1-based k-th order statistic of
    ``value_col`` WITHIN each group, for every (group, k) pair in
    ``ranks`` (group → list of ranks) — SIMULTANEOUS value-domain
    binary search, the grouped sibling of :func:`selection_order_stat`.

    Every round is ONE stateless scan: all live (group, k) pairs ship
    their mids in a single broadcast, each batch sorts once by
    (group, value) and answers every pair's count(x ≤ mid) with two
    ``searchsorted`` probes, and the driver folds the tiny per-block
    partials (blocks × pairs rows — never the data).  O(log(hi−lo))
    scans total regardless of pair count, no shuffle, no sort,
    constant driver memory beyond the bounded pair census.  ``ds_fn``
    must return a fresh cheap-to-rescan Dataset per call (a pruned
    ``read_parquet``, or a materialized 2-column projection).

    With ``weight_col``, ranks are WEIGHT ranks: the result for
    (g, k) is the smallest v with Σ_{x ≤ v} weight ≥ k (positive
    int64 weights) — the weighted-selection generalization; the
    per-batch probe answers weight-sums below mid via one per-group
    prefix-sum instead of a row count."""
    pairs = [(g, int(k)) for g, ks in ranks.items() for k in ks]
    if not pairs:
        return {}
    state = {p: [int(lo), int(hi)] for p in pairs}
    for _ in range(max_rounds):
        live = [p for p in pairs if state[p][0] < state[p][1]]
        if not live:
            break
        pg = np.array([g for g, _ in live], dtype=object)
        pm = np.array([(state[p][0] + state[p][1]) // 2 for p in live],
                      dtype=np.int64)
        ref = ray.put((pg, pm))

        def cnt(t: pa.Table) -> pa.Table:
            g_, m_ = ray.get(ref)
            gv = t.column(group_col).to_numpy(zero_copy_only=False)
            xv = (t.column(value_col).to_numpy(zero_copy_only=False)
                  .astype(np.int64))
            order = np.lexsort((xv, gv))
            gs, xs = gv[order], xv[order]
            if weight_col is not None:
                wv = (t.column(weight_col)
                      .to_numpy(zero_copy_only=False)
                      .astype(np.int64))[order]
                cum = np.concatenate(([0], np.cumsum(wv)))
            out = np.empty(len(g_), np.int64)
            for i in range(len(g_)):
                a = np.searchsorted(gs, g_[i], side="left")
                b = np.searchsorted(gs, g_[i], side="right")
                j = np.searchsorted(xs[a:b], m_[i], side="right")
                out[i] = (j if weight_col is None
                          else cum[a + j] - cum[a])
            return pa.table({"p": pa.array(np.arange(len(g_))),
                             "c": pa.array(out)})

        tot = np.zeros(len(live), np.int64)
        for r in ds_fn().map_batches(cnt,
                                     batch_format="pyarrow").take_all():
            tot[r["p"]] += r["c"]
        for i, p in enumerate(live):
            if tot[i] >= p[1]:
                state[p][1] = int(pm[i])
            else:
                state[p][0] = int(pm[i]) + 1
    return {p: state[p][0] for p in pairs}


def grouped_median_x2(ds_fn, *, value_col: str, group_col: str,
                      lo: int, hi: int) -> pd.DataFrame:
    """→ (group, n, med_x2): the EXACT doubled median of an integer
    column per group — med_x2 = x_(⌈n/2⌉) + x_(⌊n/2⌋+1) in 1-based
    order-statistic terms, so even-n averaging stays integral (2× the
    SQL ``median``).  Group census from one combiner scan (bounded
    distinct groups by contract), both order statistics per group
    from ONE simultaneous :func:`grouped_order_stats` search."""
    parts = {}
    for r in ds_fn().map_batches(
            lambda t: pa.table(dict(zip(
                ["g", "c"],
                (lambda v, c: (pa.array(v), pa.array(c.astype(np.int64))))(
                    *np.unique(t.column(group_col).to_numpy(
                        zero_copy_only=False), return_counts=True))))),
            batch_format="pyarrow").take_all():
        parts[r["g"]] = parts.get(r["g"], 0) + int(r["c"])
    ranks = {g: sorted({(n + 1) // 2, n // 2 + 1})
             for g, n in parts.items()}
    stats = grouped_order_stats(ds_fn, value_col=value_col,
                                group_col=group_col, ranks=ranks,
                                lo=lo, hi=hi)
    groups = sorted(parts)
    med2 = [stats[(g, (parts[g] + 1) // 2)]
            + stats[(g, parts[g] // 2 + 1)] for g in groups]
    return pd.DataFrame({
        group_col: groups,
        "n": np.array([parts[g] for g in groups], np.int64),
        "med_x2": np.array(med2, np.int64)})


def mad_group(ds_fn, *, value_col: str, group_col: str, lo: int,
              hi: int) -> pd.DataFrame:
    """→ (group, n, med_x2, mad_x4): exact grouped median AND median
    absolute deviation of an integer column, both as scaled integers
    (med_x2 = 2·median, mad_x4 = 4·MAD — the deviations |2x − med_x2|
    are already doubled, and their median doubles again), via two
    :func:`grouped_median_x2` selection passes.  The robust
    scale/location summary (outlier fences at med ± c·MAD) with NO
    sort, NO shuffle and no float until the caller divides —
    unbounded value cardinality, bounded group census."""
    med = grouped_median_x2(ds_fn, value_col=value_col,
                            group_col=group_col, lo=lo, hi=hi)
    med_map = dict(zip(med[group_col], med["med_x2"].astype(int)))
    ref = ray.put(med_map)

    def dev(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        gv = t.column(group_col).to_pandas()
        xv = (t.column(value_col).to_numpy(zero_copy_only=False)
              .astype(np.int64))
        m2 = gv.map(m).to_numpy(np.int64)
        return pa.table({group_col: t.column(group_col),
                         "_dev2": pa.array(np.abs(2 * xv - m2))})

    mad = grouped_median_x2(
        lambda: ds_fn().map_batches(dev, batch_format="pyarrow"),
        value_col="_dev2", group_col=group_col, lo=0,
        hi=2 * (int(hi) - int(lo)) + 2)
    out = med.merge(mad.rename(columns={"med_x2": "mad_x4",
                                        "n": "_n2"}), on=group_col)
    return out[[group_col, "n", "med_x2", "mad_x4"]]


def cusum_change_point(ds: "ray.data.Dataset", *, group_col: str,
                       seq_col: str, value_col: str,
                       num_partitions: int = 32) -> "ray.data.Dataset":
    """→ (group, n, k_star, m_star): the exact CUSUM change-point per
    group — for the sequence x_1..x_n ordered by ``seq_col``, the
    interior split k maximizing |n·S_k| where S_k = Σ_{i≤k}x_i − k·x̄
    (the classic at-most-one-change-point statistic; Page 1954).
    Everything stays int64: M_k = n·P_k − k·T with P the prefix sum
    and T the total, so the argmax is exact — no float until the
    caller rescales by 1/n.  Ties break to the smallest k; m_star is
    the SIGNED M at k_star; groups with n < 2 have no interior split
    and emit no row.

    One coarse hash partition on the group key (all of a group's rows
    co-locate), then EVERY group in a partition resolves together in
    one sorted numpy pass — segment-reset prefix sums + one lexsort
    argmax, never a per-group task.  Int64 bound: |M_k| ≤ n·Σ|x| —
    keep n·max|x| under 2⁶³ or pre-scale upstream."""

    def tag(t: pa.Table) -> pa.Table:
        g = (t.column(group_col).cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        part = (g.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(64 - 6)).astype(np.int64) % num_partitions
        return pa.table({
            "_part": pa.array(part), "g": pa.array(g),
            "i": t.column(seq_col).cast(pa.int64()),
            "x": t.column(value_col).cast(pa.int64())})

    def per_partition(df: pd.DataFrame) -> pa.Table:
        # (i, x) order: seq keys may repeat (duplicate line numbers
        # observed in the wild) — adding the value as tiebreak makes
        # the prefix-sum sequence deterministic, because remaining
        # ties are full-row ties whose order cannot change any M_k
        df = df.sort_values(["g", "i", "x"], kind="stable")
        g = df["g"].to_numpy(np.int64)
        x = df["x"].to_numpy(np.int64)
        # segment bounds: starts[j] .. ends[j] rows of group j
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        ends = np.r_[starts[1:], len(g)]
        n_per = ends - starts
        n = np.repeat(n_per, n_per)
        tot = np.repeat(np.add.reduceat(x, starts), n_per)
        p = np.cumsum(x)
        base = np.repeat(np.r_[0, p[ends[:-1] - 1]], n_per)
        p = p - base                       # prefix within group
        k = np.arange(len(g)) - np.repeat(starts, n_per) + 1
        m = n * p - k * tot
        keep = k < n                       # interior splits only
        if not keep.any():
            return pa.table({"g": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "k_star": pa.array([], pa.int64()),
                             "m_star": pa.array([], pa.int64())})
        gk, kk, mk, nk = g[keep], k[keep], m[keep], n[keep]
        order = np.lexsort((kk, -np.abs(mk), gk))
        gs = gk[order]
        first = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        sel = order[first]
        return pa.table({"g": pa.array(gk[sel]),
                         "n": pa.array(nk[sel]),
                         "k_star": pa.array(kk[sel]),
                         "m_star": pa.array(mk[sel])})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_part").map_groups(per_partition,
                                         batch_format="pandas"))


def autocorr_lag1(ds: "ray.data.Dataset", *, group_col: str,
                  seq_col: str, value_col: str,
                  num_partitions: int = 32) -> "ray.data.Dataset":
    """→ (g, m, sx, sy, sxy, sxx, syy, r1): the lag-1 Pearson
    autocorrelation of each group's ``seq_col``-ordered integer value
    sequence — the consecutive-pair correlation r1 = corr(x_i,
    x_{i+1}) over the m = n−1 pairs, computed from EXACT int64
    sufficient statistics with one float finish mirrored term-for-term
    in SQL: r1 = (m·sxy − sx·sy) / (√(m·sxx − sx²)·√(m·syy − sy²)),
    6dp.  Groups where either variance term is zero (constant leg, or
    m < 2) emit r1 = 0.0 with the statistics intact — the caller can
    tell "undefined" (variance 0) from "uncorrelated" by the columns.

    Same physical plan as :func:`cusum_change_point`: one coarse
    group-hash partition, every group in a partition resolves in one
    sorted numpy pass (segment masks kill cross-group pairs — never a
    per-group task); duplicate seq keys are made deterministic by the
    (seq, value) tiebreak.  Int64 bound: m·Σx² must stay under 2⁶³."""

    def tag(t: pa.Table) -> pa.Table:
        g = (t.column(group_col).cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        part = (g.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(64 - 6)).astype(np.int64) % num_partitions
        return pa.table({
            "_part": pa.array(part), "g": pa.array(g),
            "i": t.column(seq_col).cast(pa.int64()),
            "x": t.column(value_col).cast(pa.int64())})

    def per_partition(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["g", "i", "x"], kind="stable")
        g = df["g"].to_numpy(np.int64)
        x = df["x"].to_numpy(np.int64)
        if len(g) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"g": z, "m": z, "sx": z, "sy": z,
                             "sxy": z, "sxx": z, "syy": z,
                             "r1": pa.array([], pa.float64())})
        # consecutive pairs within a group: rows i, i+1 with equal g
        same = g[1:] == g[:-1]
        pg = g[:-1][same]
        a = x[:-1][same]
        b = x[1:][same]
        # per-group integer sufficient statistics via reduceat
        starts = np.flatnonzero(np.r_[True, pg[1:] != pg[:-1]]) \
            if len(pg) else np.array([], np.int64)
        gid = pg[starts] if len(pg) else pg
        m = np.diff(np.r_[starts, len(pg)]).astype(np.int64) \
            if len(pg) else np.array([], np.int64)

        def seg(vals):
            return (np.add.reduceat(vals, starts).astype(np.int64)
                    if len(pg) else np.array([], np.int64))

        sx, sy = seg(a), seg(b)
        sxy, sxx, syy = seg(a * b), seg(a * a), seg(b * b)
        vx = m * sxx - sx * sx
        vy = m * syy - sy * sy
        ok = (vx > 0) & (vy > 0)
        from ..functions.rounding import round_half_away

        r1 = np.zeros(len(m))
        # half-away rounding: perfect-square variance legs make r1 a
        # plain rational that can land on a dyadic 6dp tie (observed
        # -5/128 at sf0.1) where np.round diverges from DuckDB
        r1[ok] = round_half_away(
            (m[ok] * sxy[ok] - sx[ok] * sy[ok])
            / (np.sqrt(vx[ok]) * np.sqrt(vy[ok])), 6)
        # singleton groups never form a pair and emit no row — SQL's
        # inner lead() join drops them identically
        return pa.table({"g": pa.array(gid), "m": pa.array(m),
                         "sx": pa.array(sx), "sy": pa.array(sy),
                         "sxy": pa.array(sxy), "sxx": pa.array(sxx),
                         "syy": pa.array(syy),
                         "r1": pa.array(round_half_away(r1, 6))})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_part").map_groups(per_partition,
                                         batch_format="pandas"))


def grouped_weighted_median(ds_fn, *, value_col: str, weight_col: str,
                            group_col: str, lo: int,
                            hi: int) -> pd.DataFrame:
    """→ (group, w_total, wmed): the LOWER weighted median per group —
    the smallest v with Σ_{x ≤ v} weight ≥ ⌈W/2⌉ (positive int64
    weights, W the group's total) — the grouped sibling of the global
    `weighted_median` query, riding the SAME simultaneous value-domain
    binary search as :func:`grouped_median_x2` with weight-rank
    probes.  O(log range) stateless scans, no sort, no shuffle,
    bounded group census."""
    totals: dict = {}
    for r in ds_fn().map_batches(
            lambda t: pa.Table.from_pandas(
                pd.DataFrame({
                    "g": t.column(group_col).to_pandas(),
                    "w": t.column(weight_col).to_numpy(
                        zero_copy_only=False).astype(np.int64)})
                .groupby("g", sort=False)["w"].sum().reset_index(),
                preserve_index=False),
            batch_format="pyarrow").take_all():
        totals[r["g"]] = totals.get(r["g"], 0) + int(r["w"])
    ranks = {g: [(w + 1) // 2] for g, w in totals.items() if w > 0}
    stats = grouped_order_stats(ds_fn, value_col=value_col,
                                group_col=group_col, ranks=ranks,
                                lo=lo, hi=hi, weight_col=weight_col)
    groups = sorted(ranks)
    return pd.DataFrame({
        group_col: groups,
        "w_total": np.array([totals[g] for g in groups], np.int64),
        "wmed": np.array([stats[(g, (totals[g] + 1) // 2)]
                          for g in groups], np.int64)})
