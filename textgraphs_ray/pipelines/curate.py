"""Training-data curation pipeline: the composed cleaning chain a
large-scale pretraining corpus goes through, built entirely from the
engine's operator families:

    quality scoring ──► language filter ──► exact dedup
        ──► MinHash near-dedup ──► deterministic sample ──► curated docs

Every stage is a streaming ``map_batches``/groupby over the documents
Dataset; the keep/drop decisions are represented as SMALL id sets
(losers only — the overwhelming majority of rows pass) broadcast via
``ray.put``.  At 10^12 docs pass ``loser_plan="join"``: the loser ids
stay a Dataset and survivors come from a hash-partitioned anti-join on
doc_id (:func:`_drop_losers_join`); the default broadcast form is
correct whenever losers fit one object (≲10^8 ids), which holds for
dedup rates under ~10%.  Both plans are output-identical
(parity-tested; ``curate_join`` forces the join plan against the
``curate_oracle`` SQL).

Stats are first-class: the returned dict reports per-stage row counts
so a curation run is auditable (what was dropped and why).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.dedup import exact_dedup, minhash_dedup
from ..stages.text import LangId, QualityScorer


def _exact_loser_ds(ds, id_col: str, text_col: str) -> "ray.data.Dataset":
    """Exact-dup losers as a DATASET (``loser`` column, id type): every
    id except each fingerprint's keeper.

    The duplicated-fingerprint table is collected ONCE (it has one row
    per duplicated hash — small whenever the dup rate is bounded); the
    loser scan itself is a distributed ``map_batches``, and the loser
    ROWS (dup_rate × N — the part that scales with the corpus) never
    visit the driver on the ``loser_plan="join"`` path."""
    fp = exact_dedup(ds, text_col=text_col, id_col=id_col)
    dup_rows = fp.map_batches(
        lambda t: t.filter(pc.greater(t.column("n_dups"), 1)),
        batch_format="pyarrow").take_all()
    keepers = {r["keeper"] for r in dup_rows}
    dup_fp_set = {r["fp"] for r in dup_rows}
    # re-scan: ids sharing a duplicated fingerprint, minus keepers
    import hashlib

    keep_ref = ray.put(keepers)
    fps_ref = ray.put(dup_fp_set)

    def losers(batch: pa.Table) -> pa.Table:
        ks = ray.get(keep_ref)
        fps = ray.get(fps_ref)
        ids, texts = (batch.column(id_col).to_pylist(),
                      batch.column(text_col).to_pylist())
        out = [i for i, t in zip(ids, texts)
               if hashlib.md5((t or "").encode()).hexdigest() in fps
               and i not in ks]
        return pa.table({"loser": pa.array(out, batch.schema.field(id_col).type)})

    return ds.map_batches(losers, batch_format="pyarrow")


def _loser_ids_exact(ds, id_col: str, text_col: str) -> set:
    return {r["loser"]
            for r in _exact_loser_ds(ds, id_col, text_col).iter_rows()}


def _near_loser_ds(ds, id_col: str, text_col: str,
                   jaccard_threshold: float,
                   concurrency) -> "ray.data.Dataset":
    """Near-dup losers as a DATASET (``loser`` column, string): every
    member of a multi-doc cluster except the min id (cluster ids are
    strings — ids compared as strings).

    Keeper selection is DISTRIBUTED: a groupby(cluster_id) aggregate
    picks min-id keeper + cluster size; only multi-doc clusters (≤ the
    loser count, small by the bounded-dup-rate assumption) reach the
    driver, and the loser scan is a broadcast-lookup ``map_batches``
    over the cluster table — never a full-table ``to_pandas``."""
    from ray.data.aggregate import Count, Min

    # minhash banding is task-based (stateless); an actor-pool tuple
    # from the curate chain maps to its max-worker count
    conc = max(concurrency) if isinstance(concurrency, tuple) \
        else concurrency
    clusters = minhash_dedup(ds, text_col=text_col, id_col=id_col,
                             jaccard_threshold=jaccard_threshold,
                             concurrency=conc)
    agg = clusters.groupby("cluster_id").aggregate(
        Min("key", alias_name="keeper"), Count(alias_name="sz"))
    multi = agg.map_batches(
        lambda t: t.filter(pc.greater(t.column("sz"), 1)),
        batch_format="pyarrow")
    keeper_by_cluster = {r["cluster_id"]: r["keeper"]
                         for r in multi.take_all()}
    ref = ray.put(keeper_by_cluster)

    def losers(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        if not m:
            return pa.table({"loser": pa.array([], pa.string())})
        cids = pa.array(list(m.keys()), t.schema.field("cluster_id").type)
        keeps = pa.array(list(m.values()), pa.string())
        idx = pc.index_in(t.column("cluster_id"), value_set=cids)
        keeper = pc.take(keeps, idx)
        is_loser = pc.and_(pc.is_valid(keeper),
                           pc.not_equal(t.column("key"), keeper))
        return pa.table({"loser": t.filter(is_loser).column("key")})

    return clusters.map_batches(losers, batch_format="pyarrow")


def _loser_ids_near(ds, id_col: str, text_col: str,
                    jaccard_threshold: float, concurrency) -> set:
    return {r["loser"]
            for r in _near_loser_ds(ds, id_col, text_col,
                                    jaccard_threshold,
                                    concurrency).iter_rows()}


def curate_corpus(docs_ds: "ray.data.Dataset", *,
                  id_col: str = "doc_id", text_col: str = "text",
                  min_quality: float = 0.4, langs: tuple = ("en",),
                  jaccard_threshold: float = 0.7,
                  max_word_dup_ratio: float | None = None,
                  max_compress_ratio: float | None = None,
                  sample_hex_prefix: str | None = None,
                  concurrency=(1, 4),
                  loser_plan: str = "broadcast",
                  num_partitions: int = 32) -> dict:
    """→ {"docs": curated Dataset, "stats": per-stage row counts}.

    Optional extra filters (None = off): ``max_word_dup_ratio`` drops
    Gopher-style repetitive documents; ``max_compress_ratio`` drops
    documents whose zlib ratio exceeds the bound (noise / non-text).
    ``sample_hex_prefix``: keep only docs whose md5(doc_id) starts with
    this hex prefix (deterministic content-hash sampling; None = all).

    ``loser_plan`` picks the physical plan for the dedup-loser drop
    (both output-identical):

    * ``"broadcast"`` (default): loser id SETS collected to the driver
      and ``ray.put`` once — right whenever losers fit one object
      (≲10^8 ids; dup rates under ~10%).
    * ``"join"``: loser ids stay a Dataset; survivors come from a
      hash-partitioned ANTI join on the id (``stages/join.py
      shuffle_join``) — the loser rows never visit the driver.  The
      10^12-doc / extreme-dup-rate path the module doc promises.
    """
    stats: dict = {"input": docs_ds.count()}

    scored = (docs_ds
              .map_batches(QualityScorer, batch_format="pyarrow",
                           concurrency=concurrency)
              .map_batches(LangId, batch_format="pyarrow",
                           concurrency=concurrency))
    if max_word_dup_ratio is not None:
        from ..stages.text import RepetitionScorer

        scored = scored.map_batches(RepetitionScorer,
                                    batch_format="pyarrow",
                                    concurrency=concurrency)
    if max_compress_ratio is not None:
        from ..stages.text import CompressionRatio

        scored = scored.map_batches(CompressionRatio,
                                    batch_format="pyarrow",
                                    concurrency=concurrency)

    def keep_filter(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t.column("quality_score"),
                             pa.scalar(min_quality)),
            pc.is_in(t.column("lang_pred"),
                     value_set=pa.array(list(langs))))
        if max_word_dup_ratio is not None:
            mask = pc.and_(mask, pc.less_equal(
                t.column("word_dup_ratio"),
                pa.scalar(max_word_dup_ratio)))
        if max_compress_ratio is not None:
            mask = pc.and_(mask, pc.less_equal(
                t.column("compress_ratio"),
                pa.scalar(max_compress_ratio)))
        return t.filter(mask)

    kept = scored.map_batches(keep_filter,
                              batch_format="pyarrow").materialize()
    stats["after_quality_lang"] = kept.count()

    if loser_plan == "join":
        curated = _drop_losers_join(kept, stats, id_col=id_col,
                                    text_col=text_col,
                                    jaccard_threshold=jaccard_threshold,
                                    concurrency=concurrency,
                                    num_partitions=num_partitions)
        return _finish(curated, stats, id_col, sample_hex_prefix)
    if loser_plan != "broadcast":
        raise ValueError(f"unknown loser_plan: {loser_plan!r}")

    exact_losers = _loser_ids_exact(kept, id_col, text_col)
    stats["exact_dup_losers"] = len(exact_losers)
    near_losers = _loser_ids_near(kept, id_col, text_col,
                                  jaccard_threshold, concurrency)
    # exact losers are a subset of near losers by construction (equal
    # text ⇒ same cluster); keep the stats additive
    near_losers -= {str(i) for i in exact_losers}
    stats["near_dup_losers"] = len(near_losers)

    losers_ref = ray.put(exact_losers)
    near_ref = ray.put(near_losers)

    def drop_losers(t: pa.Table) -> pa.Table:
        ex = ray.get(losers_ref)
        nr = ray.get(near_ref)
        ids = t.column(id_col)
        in_ex = pc.is_in(ids, value_set=pa.array(
            list(ex), ids.type)) if ex else pa.array([False] * len(ids))
        sids = pc.cast(ids, pa.string())
        in_nr = pc.is_in(sids, value_set=pa.array(
            list(nr), pa.string())) if nr else pa.array([False] * len(ids))
        return t.filter(pc.invert(pc.or_(in_ex, in_nr)))

    curated = kept.map_batches(drop_losers, batch_format="pyarrow")
    return _finish(curated, stats, id_col, sample_hex_prefix)


def _finish(curated: "ray.data.Dataset", stats: dict, id_col: str,
            sample_hex_prefix: str | None) -> dict:
    """Shared tail of both loser plans: optional deterministic
    hex-prefix sample, pin, output count."""
    if sample_hex_prefix is not None:
        import hashlib

        def samp(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_pylist()
            keep = [hashlib.md5(str(i).encode()).hexdigest()
                    .startswith(sample_hex_prefix) for i in ids]
            return t.filter(pa.array(keep))

        curated = curated.map_batches(samp, batch_format="pyarrow")

    curated = curated.materialize()
    stats["output"] = curated.count()
    return {"docs": curated, "stats": stats}


def _drop_losers_join(kept: "ray.data.Dataset", stats: dict, *,
                      id_col: str, text_col: str,
                      jaccard_threshold: float, concurrency,
                      num_partitions: int) -> "ray.data.Dataset":
    """``loser_plan="join"``: drop dedup losers via a hash-partitioned
    ANTI join instead of a driver-collected broadcast set.

    The loser Datasets are pinned once (each is consumed twice: stats
    count + the join — consume-once doctrine, CLAUDE.md); they are
    dup_rate × N rows but never leave the cluster.  Stats stay additive
    exactly as in the broadcast plan: ``near_dup_losers`` counts near
    losers NOT already exact losers (a real anti join, not a subset
    assumption — with near-dedup disabled the exact⊆near containment
    does not hold)."""
    from ..stages.join import shuffle_join

    def as_str(t: pa.Table) -> pa.Table:
        return pa.table({"loser": pc.cast(t.column("loser"), pa.string())})

    exact_ds = (_exact_loser_ds(kept, id_col, text_col)
                .map_batches(as_str, batch_format="pyarrow")
                .materialize())
    near_all = _near_loser_ds(kept, id_col, text_col,
                              jaccard_threshold, concurrency)
    near_ds = shuffle_join(near_all, exact_ds, "loser", "loser",
                           num_partitions, how="anti").materialize()
    stats["exact_dup_losers"] = exact_ds.count()
    stats["near_dup_losers"] = near_ds.count()

    losers = exact_ds.union(near_ds)
    kschema = pa.schema(list(zip(kept.schema().names,
                                 kept.schema().types)))

    def add_sid(t: pa.Table) -> pa.Table:
        return t.append_column("_sid", pc.cast(t.column(id_col),
                                               pa.string()))

    keyed = kept.map_batches(add_sid, batch_format="pyarrow")
    survivors = shuffle_join(keyed, losers, "_sid", "loser",
                             num_partitions, how="anti")
    # pandas→arrow round-trips in the merge type empty string columns
    # as null; select away the key helper and cast back to kept's schema
    return survivors.map_batches(
        lambda t: t.select(kschema.names).cast(kschema),
        batch_format="pyarrow")
