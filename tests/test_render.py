"""HTML lemma-graph rendering (stages/render.py; reference
vis.py:94-164 parity for styling, gated pyvis path skip-tested)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from textgraphs_ray.compat import NODE_STYLES
from textgraphs_ray.stages.render import (render_html, render_pyvis,
                                          spring_layout,
                                          write_lemma_graph_html)

HAVE_PYVIS = True
try:
    import pyvis  # noqa: F401
except ImportError:
    HAVE_PYVIS = False


def _tables():
    styles = {s.label: s for s in NODE_STYLES}
    kinds = ["ent", "lem", "iri", "chu", "dep", "media"]
    nodes = pd.DataFrame({
        "key": [f"n{i}" for i in range(6)],
        "text": [f"node {i}" for i in range(6)],
        "kind": kinds,
        "shape": [styles[k].shape for k in kinds],
        "color": [styles[k].color for k in kinds],
        "size": [12.0 + 4 * i for i in range(6)],
    })
    edges = pd.DataFrame({
        "src_key": ["n0", "n1", "n2", "n3"],
        "dst_key": ["n1", "n2", "n3", "n4"],
        "kind": ["dep", "inf", "syn", "dep"],
        "rel": ["nsubj", "directed_by", "same_as", "dobj"],
    })
    return nodes, edges


def test_spring_layout_deterministic_and_bounded():
    nodes, edges = _tables()
    a = spring_layout(nodes, edges, seed=7)
    b = spring_layout(nodes, edges, seed=7)
    pd.testing.assert_frame_equal(a, b)
    assert ((a["x"] >= 0) & (a["x"] <= 1)).all()
    assert ((a["y"] >= 0) & (a["y"] <= 1)).all()
    # connected nodes end up closer than the layout diagonal
    pos = {k: np.array([x, y]) for k, x, y in zip(a["key"], a["x"], a["y"])}
    d01 = np.linalg.norm(pos["n0"] - pos["n1"])
    assert d01 < np.sqrt(2)
    # empty graph
    empty = spring_layout(nodes.iloc[:0], edges.iloc[:0])
    assert len(empty) == 0 and {"x", "y"} <= set(empty.columns)


def test_render_html_styles_and_reproducibility():
    nodes, edges = _tables()
    doc = render_html(nodes, edges, seed=3)
    assert doc == render_html(nodes, edges, seed=3)  # byte-reproducible
    assert doc.startswith("<!DOCTYPE html>") and "</svg>" in doc
    # every NodeStyle shape renders as its SVG element
    assert doc.count("<circle") == 1            # ent
    assert doc.count("<rect") == 2              # lem (square) + media (box)
    assert doc.count("<polygon") == 3           # chu + iri + dep(star)
    # NodeStyle colors survive verbatim
    for s in NODE_STYLES:
        assert s.color in doc
    # edge styling by relation kind (reference vis.py:150-163)
    assert 'stroke="hsl(289, 17%, 49%)" stroke-width="3"' in doc  # inf
    assert 'stroke="hsl(55, 17%, 49%)" stroke-width="2"' in doc   # syn
    # hover titles carry the relation + node labels
    assert "<title>directed_by</title>" in doc
    assert "<title>node 0</title>" in doc
    # labels are escaped
    bad = nodes.copy()
    bad.loc[0, "text"] = "<script>alert(1)</script>"
    assert "<script>" not in render_html(bad, edges)


def test_write_lemma_graph_html_fallback(tmp_path):
    nodes, edges = _tables()
    path = str(tmp_path / "graph.html")
    engine = write_lemma_graph_html(nodes, edges, path)
    assert engine == ("pyvis" if HAVE_PYVIS else "svg")
    body = open(path).read()
    assert "html" in body.lower() and len(body) > 500


def test_compat_render_writes_html(tmp_path):
    import textgraphs_ray.compat as textgraphs

    tg = textgraphs.TextGraphs()
    tg.collect_graph_elements(tg.create_pipeline(
        "Werner Herzog directed a film in Germany."))
    tg.construct_lemma_graph()
    tg.calc_phrase_ranks()
    path = str(tmp_path / "lemma.html")
    nodes, edges = textgraphs.RenderPyVis(tg).render_lemma_graph(path)
    doc = open(path).read()
    assert "svg" in doc or HAVE_PYVIS
    # styled shapes flow from the NodeStyle table into the document
    for shape in set(nodes["shape"]):
        assert shape in {"star", "square", "circle", "triangle",
                         "diamond", "box", "dot"}


@pytest.mark.skipif(not HAVE_PYVIS, reason="pyvis not installed")
def test_render_pyvis_network():  # pragma: no cover - sandbox lacks pyvis
    nodes, edges = _tables()
    net = render_pyvis(nodes, edges)
    assert len(net.nodes) == len(nodes)
