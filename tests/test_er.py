"""ER pipeline tests: pairwise F1, media merges, skew (FIXTURES.md F5)."""

from __future__ import annotations

from itertools import combinations

import ray.data as rd


def _pairwise(rows):
    tp = fp = fn = 0
    for (k1, e1, c1), (k2, e2, c2) in combinations(rows, 2):
        same_t, same_p = e1 == e2, c1 == c2
        if same_t and same_p:
            tp += 1
        elif same_p:
            fp += 1
        elif same_t:
            fn += 1
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    return prec, rec, 2 * prec * rec / max(1e-9, prec + rec)


import pytest


@pytest.fixture(scope="module")
def er_result(small_corpus):
    """One shared ER run for all assertions in this module."""
    from textgraphs_ray.pipelines.er import resolve_entities

    docs, truth, assets = small_corpus
    res = resolve_entities(rd.from_arrow(docs), assets=assets,
                           num_partitions=4)
    clusters = res["clusters"].to_pandas()
    spans = res["spans"].to_pandas()
    truth_df = truth.to_pandas()
    m = truth_df.merge(spans[["doc_id", "offset", "lemma_key"]],
                       on=["doc_id", "offset"], how="left")
    m = m.merge(clusters, left_on="lemma_key", right_on="key", how="left")
    return res, m


def test_pairwise_f1(er_result):
    """North rule: pairwise F1 ≥ 0.99 on labeled pairs (we evaluate on
    ALL labeled pairs — a superset of the same-block requirement)."""
    _, m = er_result
    assert m["lemma_key"].notna().all()
    assert m["cluster_id"].notna().all()
    keys = m.drop_duplicates("lemma_key")
    rows = list(zip(keys["lemma_key"], keys["entity_id"], keys["cluster_id"]))
    prec, rec, f1 = _pairwise(rows)
    assert f1 >= 0.99, (prec, rec, f1)


def test_media_mentions_join_text_clusters(er_result):
    """media spans (decoded via the stub + cosine scoring) must land in
    the same cluster as their entity's text mentions."""
    _, m = er_result
    media = m[m["surface"] == ""]
    assert len(media) > 0
    for _, row in media.iterrows():
        text_rows = m[(m["entity_id"] == row["entity_id"]) & (m["surface"] != "")]
        if len(text_rows) == 0:
            continue
        assert (text_rows["cluster_id"] == row["cluster_id"]).any(), \
            row["lemma_key"]


def test_hot_entity_single_cluster(er_result):
    """The planted hot entity (5% of docs → skewed block) must resolve
    to one cluster despite block capping/salting."""
    _, m = er_result
    hot = m[m["entity_id"] == 0]
    assert len(hot) > 5
    assert hot["cluster_id"].nunique() == 1


def test_cluster_determinism(small_corpus, er_result):
    """Same input → identical clustering under different partitioning
    (H1 order independence)."""
    from textgraphs_ray.pipelines.er import resolve_entities

    docs, _, assets = small_corpus
    a = er_result[0]["clusters"].to_pandas()
    b = resolve_entities(
        rd.from_arrow(docs).repartition(7), assets=assets,
        num_partitions=5)["clusters"].to_pandas()
    a = a.sort_values("key").reset_index(drop=True)
    b = b.sort_values("key").reset_index(drop=True)
    assert a.equals(b)


def test_hot_surface_skew_bounded_and_correct():
    """A hot entity with hundreds of DISTINCT 1-edit surface variants
    lands in one first-token block; the cap/window + deletion-band
    blocking must keep pair counts near-linear while still merging the
    variants with the canonical form."""
    import pyarrow as pa

    from textgraphs_ray.pipelines.er import resolve_entities

    canonical = "Silvester Quintana"
    last = canonical.split()[1].lower()
    variants = {canonical, canonical.upper(), "S. Quintana"}
    # every single-deletion typo of the last name (distinct surfaces)
    for p in range(1, len(last) - 1):
        variants.add("Silvester " + (last[:p] + last[p + 1:]).capitalize())
    # transpositions
    for p in range(1, len(last) - 2):
        sw = last[:p] + last[p + 1] + last[p] + last[p + 2:]
        variants.add("Silvester " + sw.capitalize())
    variants = sorted(variants)

    rows = []
    for i, v in enumerate(variants):
        rows.append({"doc_id": f"d{i:04d}", "spans": [
            {"kind": "ent", "text": v, "media_ref": "", "offset": 0}]})
    # unrelated entities to keep the corpus realistic
    for i in range(50):
        rows.append({"doc_id": f"x{i:04d}", "spans": [
            {"kind": "ent", "text": f"Other{i} Person{i}",
             "media_ref": "", "offset": 0}]})
    docs = pa.Table.from_pylist(rows)

    res = resolve_entities(rd.from_arrow(docs), num_partitions=4)
    cl = res["clusters"].to_pandas()
    assign = dict(zip(cl["key"], cl["cluster_id"]))

    canon_key = "silvester.PROPN.quintana.PROPN"
    def key_of(surface: str) -> str:
        return ".".join(w.lower() + ".PROPN" for w in surface.split())

    merged = sum(1 for v in variants
                 if assign[key_of(v)] == assign[canon_key])
    # all 1-edit variants + case + initial forms co-cluster
    assert merged >= len(variants) - 1
    # unrelated entities stay singletons
    assert assign["other0.PROPN.person0.PROPN"] != assign[canon_key]


def test_blocking_stats_closure_complete(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    df = entry.queries()["blocking_stats"]("/root/testdata/sf0.001")
    row = df.iloc[0]
    # the closure bound that makes downstream F1 = 1.0 possible
    assert row["closure_completeness"] == 1.0
    # blocking must actually block (prune >95% of the pair space)
    assert row["reduction_ratio"] > 0.95
    assert row["n_truth_pairs"] > 0


def test_sorted_neighborhood_pairs_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.blocking import sorted_neighborhood_pairs

    rng = np.random.default_rng(9)
    keys = [f"k{rng.integers(0, 40):02d}" for _ in range(200)]
    ids = list(range(200))
    ds = rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "key": pa.array(keys)})).repartition(6)
    w = 4
    # tiny bucket width forces heavy cross-bucket overlap handling
    got = sorted_neighborhood_pairs(ds, key_col="key", id_col="id",
                                    window=w,
                                    bucket_width=w + 1).take_all()
    order = sorted(range(200), key=lambda i: (keys[i], i))
    want = set()
    for a in range(200):
        for b in range(a + 1, min(a + w + 1, 200)):
            want.add((ids[order[a]], ids[order[b]], b - a))
    assert {(r["id_a"], r["id_b"], r["dist"]) for r in got} == want
    assert len(got) == len(want)   # exactly-once emission


def test_canopy_assign_planted_recall(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.blocking import canopy_assign

    # 3 planted entities with token-overlap variants + unrelated rows
    groups = {
        0: ["acme global holdings inc", "acme global holdings",
            "acme global holdings incorporated"],
        1: ["johnson family trust fund", "johnson family trust",
            "the johnson family trust fund"],
        2: ["west coast data systems llc", "west coast data systems",
            "west coast data systems limited"],
    }
    rows, gid = [], []
    for g, variants in groups.items():
        for v in variants:
            rows.append(v)
            gid.append(g)
    for i in range(30):
        rows.append(f"unrelated entity number {i} with filler tokens")
        gid.append(-1)
    ds = rd.from_arrow(pa.table({
        "key": pa.array([f"k{i}" for i in range(len(rows))]),
        "text": pa.array(rows)})).repartition(5)
    out = canopy_assign(ds, key_col="key", text_col="text",
                        t_loose=0.3, t_tight=0.7).take_all()
    canopies: dict = {}
    for r in out:
        canopies.setdefault(r["key"], set()).add(r["canopy_id"])
    # every row belongs to >= 1 canopy (fallback guarantees it)
    assert set(canopies) == {f"k{i}" for i in range(len(rows))}
    # planted same-entity pairs share at least one canopy
    for g, variants in groups.items():
        idx = [i for i, x in enumerate(gid) if x == g]
        base = canopies[f"k{idx[0]}"]
        for i in idx[1:]:
            assert base & canopies[f"k{i}"], (g, i)
