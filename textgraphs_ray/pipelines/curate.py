"""Training-data curation pipeline: the composed cleaning chain a
large-scale pretraining corpus goes through, built entirely from the
engine's operator families:

    quality scoring ──► language filter ──► exact dedup
        ──► MinHash near-dedup ──► deterministic sample ──► curated docs

Every stage is a streaming ``map_batches``/groupby over the documents
Dataset; the keep/drop decisions are represented as SMALL id sets
(losers only — the overwhelming majority of rows pass) broadcast via
``ray.put``.  At 10^12 docs the loser sets become hash-partitioned
anti-joins on doc_id; the broadcast form is correct whenever losers fit
one object (≲10^8 ids), which holds for dedup rates under ~10%.

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


def _loser_ids_exact(ds, id_col: str, text_col: str) -> set:
    """Exact-dup losers: every id except each fingerprint's keeper."""
    fp = exact_dedup(ds, text_col=text_col, id_col=id_col)
    dup_fps = fp.filter(lambda r: r["n_dups"] > 1)
    keepers = {r["keeper"] for r in dup_fps.iter_rows()}
    # re-scan: ids sharing a duplicated fingerprint, minus keepers
    import hashlib

    keep_ref = ray.put(keepers)
    fps_ref = ray.put({r["fp"] for r in dup_fps.iter_rows()})

    def losers(batch: pa.Table) -> pa.Table:
        ks = ray.get(keep_ref)
        fps = ray.get(fps_ref)
        ids, texts = (batch.column(id_col).to_pylist(),
                      batch.column(text_col).to_pylist())
        out = [i for i, t in zip(ids, texts)
               if hashlib.md5((t or "").encode()).hexdigest() in fps
               and i not in ks]
        return pa.table({"loser": pa.array(out, batch.schema.field(id_col).type)})

    loser_ds = ds.map_batches(losers, batch_format="pyarrow")
    return {r["loser"] for r in loser_ds.iter_rows()}


def _loser_ids_near(ds, id_col: str, text_col: str,
                    jaccard_threshold: float, concurrency) -> set:
    """Near-dup losers: every member of a multi-doc cluster except the
    min id (cluster ids are strings — ids compared as strings)."""
    clusters = minhash_dedup(ds, text_col=text_col, id_col=id_col,
                             jaccard_threshold=jaccard_threshold,
                             concurrency=concurrency)
    import pandas as pd

    df = clusters.to_pandas()
    sizes = df.groupby("cluster_id")["key"].transform("size")
    multi = df[sizes > 1]
    keep = multi.groupby("cluster_id")["key"].transform("min")
    return set(multi.loc[multi["key"] != keep, "key"])


def curate_corpus(docs_ds: "ray.data.Dataset", *,
                  id_col: str = "doc_id", text_col: str = "text",
                  min_quality: float = 0.4, langs: tuple = ("en",),
                  jaccard_threshold: float = 0.7,
                  sample_hex_prefix: str | None = None,
                  concurrency=(1, 4)) -> dict:
    """→ {"docs": curated Dataset, "stats": per-stage row counts}.

    ``sample_hex_prefix``: keep only docs whose md5(doc_id) starts with
    this hex prefix (deterministic content-hash sampling; None = all).
    """
    stats: dict = {"input": docs_ds.count()}

    scored = (docs_ds
              .map_batches(QualityScorer, batch_format="pyarrow",
                           concurrency=concurrency)
              .map_batches(LangId, batch_format="pyarrow",
                           concurrency=concurrency))
    kept = scored.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("quality_score"),
                             pa.scalar(min_quality)),
            pc.is_in(t.column("lang_pred"),
                     value_set=pa.array(list(langs))))),
        batch_format="pyarrow").materialize()
    stats["after_quality_lang"] = kept.count()

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
        ids = t.column(id_col).to_pylist()
        mask = [i not in ex and str(i) not in nr for i in ids]
        return t.filter(pa.array(mask))

    curated = kept.map_batches(drop_losers, batch_format="pyarrow")

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
