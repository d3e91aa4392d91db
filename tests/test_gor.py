"""GOR conformance (FIXTURES.md F3).

Golden values are the REFERENCE'S computed outputs for
examples/ingram.json (``/root/reference/docs/ex1_0.md:604-720``); the
reference itself documents that these differ from the InGram paper's
published table (``docs/ex1_0.md:579``), so reference parity — not the
paper column — is the conformance target.
"""

from __future__ import annotations

import ray.data as rd

from textgraphs_ray.pipelines.gor import affinity_scores, load_ingram

REFERENCE_OBSERVED = {
    (0, 0): 0.30, (0, 1): 0.27, (0, 2): 0.34,
    (1, 1): 0.23, (1, 2): 0.37, (1, 4): 0.13,
    (2, 2): 0.21, (2, 4): 0.13,
    (3, 3): 0.33, (3, 4): 0.56, (3, 5): 0.22,
    (4, 5): 0.44,
}


def test_ingram_affinity_matches_reference():
    edges, rels, _ = load_ingram("/root/reference/examples/ingram.json")
    df = affinity_scores(rd.from_arrow(edges), rels)
    got = {(int(a), int(b)): round(s, 2)
           for a, b, s in zip(df["rel_a"], df["rel_b"], df["score"])}
    assert got == REFERENCE_OBSERVED


def test_hub_cap_truncates_deterministically():
    edges, rels, _ = load_ingram("/root/reference/examples/ingram.json")
    full = affinity_scores(rd.from_arrow(edges), rels, max_seeds=10_000)
    capped = affinity_scores(rd.from_arrow(edges), rels, max_seeds=2)
    assert len(capped) <= len(full)
    again = affinity_scores(rd.from_arrow(edges), rels, max_seeds=2)
    assert capped.equals(again)
