"""Label-propagation closure tests + synonym bootstrap (FIXTURES F4)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from textgraphs_ray.sources.ttl import bootstrap_tables, parse_ttl
from textgraphs_ray.stages.cluster import propagate_labels


import pytest


def _cluster(nodes, edges, *, driver_threshold=2_000_000):
    nds = rd.from_arrow(pa.table({"key": pa.array(nodes, pa.string())}))
    eds = rd.from_arrow(pa.table({
        "key_a": pa.array([e[0] for e in edges], pa.string()),
        "key_b": pa.array([e[1] for e in edges], pa.string()),
    }))
    df = propagate_labels(nds, eds, num_partitions=2,
                          driver_threshold=driver_threshold).to_pandas()
    return dict(zip(df["key"], df["cluster_id"]))


# threshold=0 forces the distributed join+groupby-min+pointer-jump loop;
# the default exercises the driver union-find fast path — both must
# produce identical min-label components
@pytest.mark.parametrize("thr", [0, 2_000_000], ids=["distributed", "driver"])
def test_chain_closure(thr):
    got = _cluster(list("abcdef"), [("a", "b"), ("b", "c"), ("c", "d")],
                   driver_threshold=thr)
    assert got["a"] == got["b"] == got["c"] == got["d"] == "a"
    assert got["e"] == "e" and got["f"] == "f"


@pytest.mark.parametrize("thr", [0, 2_000_000], ids=["distributed", "driver"])
def test_star_and_disconnected(thr):
    got = _cluster(["hub", "s1", "s2", "s3", "lone"],
                   [("hub", "s1"), ("hub", "s2"), ("s3", "hub")],
                   driver_threshold=thr)
    assert len({got["hub"], got["s1"], got["s2"], got["s3"]}) == 1
    assert got["lone"] == "lone"


def test_no_edges():
    got = _cluster(["x", "y"], [])
    assert got == {"x": "x", "y": "y"}


def test_long_chain_distributed_pointer_jump():
    """64-node chain closes in ≤ max_rounds via pointer jumping
    (pure neighbor propagation would need 64 rounds)."""
    nodes = [f"n{i:03d}" for i in range(64)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(63)]
    got = _cluster(nodes, edges, driver_threshold=0)
    assert set(got.values()) == {"n000"}


TTL = """
@prefix dbo: <http://dbpedia.org/ontology/> .
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .

<entity/werner_PROPN> a dbo:Person ;
    skos:prefLabel "Werner"@en .

<entity/werner_PROPN_herzog_PROPN> a dbo:Person ;
    skos:prefLabel "Werner Herzog"@en.

dbo:Person skos:definition "People, including fictional"@en ;
    skos:prefLabel "person"@en .

<entity/werner_PROPN_herzog_PROPN> skos:broader <entity/werner_PROPN> .
"""


def test_parse_ttl_triples():
    triples = parse_ttl(TTL)
    assert ("entity/werner_PROPN", "rdf:type", "dbo:Person") in triples
    assert ("entity/werner_PROPN_herzog_PROPN", "skos:broader",
            "entity/werner_PROPN") in triples


def test_synonym_bootstrap_drives_merge():
    """FIXTURES F4: after closure, werner.PROPN and
    werner.PROPN.herzog.PROPN share a cluster (reference
    doc.py:1197-1201 skos:broader bootstrap)."""
    nodes_t, edges_t = bootstrap_tables(TTL)
    keys = nodes_t.column("key").to_pylist()
    assert "werner.PROPN" in keys
    assert "werner.PROPN.herzog.PROPN" in keys
    syn = [(s, d) for s, d, k in zip(edges_t.column("src_key").to_pylist(),
                                     edges_t.column("dst_key").to_pylist(),
                                     edges_t.column("kind").to_pylist())
           if k == "syn"]
    got = _cluster(keys, syn)
    assert got["werner.PROPN"] == got["werner.PROPN.herzog.PROPN"]


def test_sparse_edges_high_partitions_distributed():
    """Regression: with a sparse edge set and high num_partitions most
    shuffle partitions are empty — Ray's native hash join used to lose
    its schema there ("No match ... FieldRef"); the carried-through
    shuffle join (_shuffle_join) must survive it."""
    nodes = pa.table({"key": [f"n{i:02d}" for i in range(30)]})
    edges = pa.table({"key_a": ["n00", "n05"], "key_b": ["n01", "n06"]})
    got = propagate_labels(
        rd.from_arrow(nodes), rd.from_arrow(edges),
        num_partitions=16, driver_threshold=0).to_pandas()
    assert len(got) == 30
    m = dict(zip(got["key"], got["cluster_id"]))
    assert m["n00"] == m["n01"] == "n00"
    assert m["n05"] == m["n06"] == "n05"
    # singletons keep their own label
    assert m["n02"] == "n02"


def test_pagerank_distributed_paths_agree_and_match_nx():
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.rank import pagerank_distributed

    nodes = rd.from_arrow(pa.table({"key": ["a", "b", "c", "d", "iso"]}))
    edges = rd.from_arrow(pa.table({"key_a": ["a", "a", "b", "c"],
                                    "key_b": ["b", "c", "c", "a"]}))
    drv = (pagerank_distributed(nodes, edges, iters=40)
           .to_pandas().set_index("key")["rank"])
    # path equality at a shallow depth (keeps the suite fast — the
    # distributed loop pays 2 shuffles per iteration); equality for
    # one fixed iteration count implies the recurrences match
    drv12 = (pagerank_distributed(nodes, edges, iters=12)
             .to_pandas().set_index("key")["rank"])
    dist12 = (pagerank_distributed(nodes, edges, iters=12,
                                   driver_threshold=0, num_partitions=4)
              .to_pandas().set_index("key")["rank"])
    for k in ["a", "b", "c", "d", "iso"]:
        assert abs(drv12[k] - dist12[k]) < 1e-12
    assert abs(drv.sum() - 1.0) < 1e-9
    # networkx golden (pure-python impl: scipy absent in this env)
    try:
        import networkx as nx
        from networkx.algorithms.link_analysis.pagerank_alg import \
            _pagerank_python
    except ImportError:
        return
    g = nx.DiGraph()
    g.add_nodes_from(["a", "b", "c", "d", "iso"])
    g.add_edges_from([("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")])
    nxr = _pagerank_python(g, alpha=0.85, max_iter=500, tol=1e-13)
    for k in nxr:
        assert abs(drv[k] - nxr[k]) < 1e-7

    # empty graph: every node gets the uniform teleport rank
    lonely = rd.from_arrow(pa.table({"key": ["x", "y"]}))
    none_e = rd.from_arrow(pa.table({"key_a": pa.array([], pa.string()),
                                     "key_b": pa.array([], pa.string())}))
    out = (pagerank_distributed(lonely, none_e, iters=5)
           .to_pandas().set_index("key")["rank"])
    assert abs(out["x"] - 0.5) < 1e-12 and abs(out["y"] - 0.5) < 1e-12


def test_personalized_pagerank_paths_agree_and_match_nx():
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.rank import pagerank_distributed

    nodes = rd.from_arrow(pa.table({"key": ["a", "b", "c", "d", "iso",
                                            "iso_seed"]}))
    edges = rd.from_arrow(pa.table({"key_a": ["a", "a", "b", "c"],
                                    "key_b": ["b", "c", "c", "a"]}))
    seeds = {"a", "iso_seed"}
    drv = (pagerank_distributed(nodes, edges, iters=12, seeds=seeds)
           .to_pandas().set_index("key")["rank"])
    dist = (pagerank_distributed(nodes, edges, iters=12, seeds=seeds,
                                 driver_threshold=0, num_partitions=4)
            .to_pandas().set_index("key")["rank"])
    for k in ["a", "b", "c", "d", "iso", "iso_seed"]:
        assert abs(drv[k] - dist[k]) < 1e-12, k
    assert abs(drv.sum() - 1.0) < 1e-9
    # a non-seed node unreachable from the seeds drains to 0
    assert drv["iso"] == 0.0
    try:
        import networkx as nx
        from networkx.algorithms.link_analysis.pagerank_alg import \
            _pagerank_python
    except ImportError:
        return
    g = nx.DiGraph()
    g.add_nodes_from(["a", "b", "c", "d", "iso", "iso_seed"])
    g.add_edges_from([("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")])
    p = {"a": 0.5, "iso_seed": 0.5}
    nxr = _pagerank_python(g, alpha=0.85, max_iter=500, tol=1e-13,
                           personalization=p, dangling=p)
    drv_conv = (pagerank_distributed(nodes, edges, iters=200,
                                     seeds=seeds)
                .to_pandas().set_index("key")["rank"])
    for k in nxr:
        assert abs(drv_conv[k] - nxr[k]) < 1e-7, k


def test_hits_paths_agree_and_match_nx():
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.rank import hits_distributed

    nodes = rd.from_arrow(pa.table({"key": ["a", "b", "c", "d", "iso"]}))
    edges = rd.from_arrow(pa.table({"key_a": ["a", "a", "b", "d"],
                                    "key_b": ["b", "c", "c", "c"]}))
    drv = (hits_distributed(nodes, edges, iters=6)
           .to_pandas().set_index("key"))
    dist = (hits_distributed(nodes, edges, iters=6, driver_threshold=0,
                             num_partitions=4)
            .to_pandas().set_index("key"))
    for k in ["a", "b", "c", "d", "iso"]:
        assert abs(drv["hub"][k] - dist["hub"][k]) < 1e-12, k
        assert abs(drv["auth"][k] - dist["auth"][k]) < 1e-12, k
    assert abs(drv["hub"].sum() - 1.0) < 1e-9
    assert abs(drv["auth"].sum() - 1.0) < 1e-9
    assert drv["hub"]["iso"] == 0.0 and drv["auth"]["iso"] == 0.0
    try:
        import networkx as nx
    except ImportError:
        return
    g = nx.DiGraph()
    g.add_nodes_from(["a", "b", "c", "d", "iso"])
    g.add_edges_from([("a", "b"), ("a", "c"), ("b", "c"), ("d", "c")])
    try:
        nxh, nxa = nx.hits(g, max_iter=500, tol=1e-13)
    except ImportError:       # nx.hits needs scipy in some versions
        return
    conv = (hits_distributed(nodes, edges, iters=100)
            .to_pandas().set_index("key"))
    for k in nxh:
        assert abs(conv["hub"][k] - nxh[k]) < 1e-7, k
        assert abs(conv["auth"][k] - nxa[k]) < 1e-7, k


# ---- golden_records -------------------------------------------------

def test_golden_records_survivorship(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.cluster import golden_records

    spans = rd.from_arrow(pa.table({
        "lemma_key": pa.array(["a1", "a1", "a1", "a2", "b1", "b1"]),
        "text": pa.array(["Acme Corp", "Acme Corp", "Acme Corp",
                          "ACME Corporation", "Beta LLC",
                          "Beta LLC"])})).repartition(3)
    clusters = rd.from_arrow(pa.table({
        "key": pa.array(["a1", "a2", "b1"]),
        "cluster_id": pa.array(["A", "A", "B"])}))
    got = {r["cluster_id"]: r for r in
           golden_records(clusters, spans).take_all()}
    # cluster A: "Acme Corp" (3 occurrences) beats "ACME Corporation"
    assert got["A"]["canonical"] == "Acme Corp"
    assert got["A"]["n_keys"] == 2 and got["A"]["n_occurrences"] == 4
    assert got["B"]["canonical"] == "Beta LLC"
    assert got["B"]["n_keys"] == 1 and got["B"]["n_occurrences"] == 2


def test_golden_records_tie_break(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from textgraphs_ray.stages.cluster import golden_records

    spans = rd.from_arrow(pa.table({
        "lemma_key": pa.array(["x1", "x2"]),
        "text": pa.array(["zeta", "alpha"])}))
    clusters = rd.from_arrow(pa.table({
        "key": pa.array(["x1", "x2"]),
        "cluster_id": pa.array(["C", "C"])}))
    got = golden_records(clusters, spans).take_all()
    # equal counts: lexicographically smallest survives
    assert got[0]["canonical"] == "alpha"
