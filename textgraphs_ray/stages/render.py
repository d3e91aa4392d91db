"""HTML rendering of a lemma graph (reference ``vis.py:94-164``).

The reference's ``RenderPyVis.render_lemma_graph`` builds an
interactive ``pyvis.network.Network`` with per-kind node styling
(``NODE_STYLES``) and per-kind edge arrows/colors.  This engine is
headless — rendering happens on the DRIVER over the small styled
node/edge tables (a cluster's lemma graph is bounded; the 100-TB data
never flows through here) — so the emitter has two gated paths, like
the networkx gate in ``stages/viz.py``:

- **pyvis** (optional, absent in this container): builds the real
  ``pyvis.network.Network`` — exercised by a skip-test.
- **self-contained SVG** (always available, pure numpy/stdlib):
  deterministic seeded spring layout + inline-SVG shapes matching the
  NodeStyle table (star/square/circle/triangle/diamond/box), emitted
  as one standalone HTML string with hover titles.  No JS, no CDN, no
  dependency — byte-reproducible for a given graph.

Node styling contract (reference parity): shape and color come from
``compat.NODE_STYLES`` by node kind; node size follows the rank
weight; IRI nodes label with the normalized prefix form.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pandas as pd


def spring_layout(nodes: pd.DataFrame, edges: pd.DataFrame, *,
                  iters: int = 60, seed: int = 42) -> pd.DataFrame:
    """Deterministic Fruchterman–Reingold-style layout → nodes with
    ``x``/``y`` in [0, 1].  Pure numpy O(n²) per iteration — the input
    is a cluster's lemma graph (hundreds of nodes), never the corpus.
    """
    keys = nodes["key"].tolist()
    n = len(keys)
    out = nodes.copy()
    if n == 0:
        out["x"] = np.zeros(0)
        out["y"] = np.zeros(0)
        return out
    idx = {k: i for i, k in enumerate(keys)}
    rng = np.random.RandomState(seed)
    pos = rng.uniform(0.0, 1.0, size=(n, 2))
    pairs = [(idx[a], idx[b])
             for a, b in zip(edges.get("src_key", []),
                             edges.get("dst_key", []))
             if a in idx and b in idx and a != b]
    e = (np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
         if pairs else np.zeros((0, 2), np.int64))
    k = 1.0 / np.sqrt(n)
    t = 0.1
    for _ in range(iters):
        delta = pos[:, None, :] - pos[None, :, :]          # (n, n, 2)
        dist = np.maximum(np.linalg.norm(delta, axis=2), 1e-9)
        # repulsion k²/d between every pair
        disp = (delta / dist[..., None]
                * (k * k / dist)[..., None]).sum(axis=1)
        if len(e):
            # attraction d²/k along edges
            dvec = pos[e[:, 0]] - pos[e[:, 1]]
            dl = np.maximum(np.linalg.norm(dvec, axis=1), 1e-9)
            f = (dvec / dl[:, None]) * (dl * dl / k)[:, None]
            np.add.at(disp, e[:, 0], -f)
            np.add.at(disp, e[:, 1], f)
        dn = np.maximum(np.linalg.norm(disp, axis=1), 1e-9)
        pos += disp / dn[:, None] * np.minimum(dn, t)[:, None]
        t *= 0.95
    span = np.maximum(pos.max(axis=0) - pos.min(axis=0), 1e-9)
    pos = (pos - pos.min(axis=0)) / span
    out["x"] = pos[:, 0]
    out["y"] = pos[:, 1]
    return out


def _svg_shape(shape: str, x: float, y: float, r: float,
               color: str) -> str:
    """One SVG element per NodeStyle shape."""
    if shape == "square":
        return (f'<rect x="{x - r:.1f}" y="{y - r:.1f}" '
                f'width="{2 * r:.1f}" height="{2 * r:.1f}" '
                f'fill="{color}"/>')
    if shape == "box":
        return (f'<rect x="{x - 1.4 * r:.1f}" y="{y - r:.1f}" '
                f'width="{2.8 * r:.1f}" height="{2 * r:.1f}" rx="3" '
                f'fill="{color}"/>')
    if shape == "triangle":
        pts = " ".join(f"{x + r * np.cos(a):.1f},{y + r * np.sin(a):.1f}"
                       for a in (-np.pi / 2, np.pi / 6, 5 * np.pi / 6))
        return f'<polygon points="{pts}" fill="{color}"/>'
    if shape == "diamond":
        pts = (f"{x:.1f},{y - r:.1f} {x + r:.1f},{y:.1f} "
               f"{x:.1f},{y + r:.1f} {x - r:.1f},{y:.1f}")
        return f'<polygon points="{pts}" fill="{color}"/>'
    if shape == "star":
        pts = []
        for i in range(10):
            rr = r if i % 2 == 0 else 0.45 * r
            a = -np.pi / 2 + i * np.pi / 5
            pts.append(f"{x + rr * np.cos(a):.1f},"
                       f"{y + rr * np.sin(a):.1f}")
        return f'<polygon points="{" ".join(pts)}" fill="{color}"/>'
    return f'<circle cx="{x:.1f}" cy="{y:.1f}" r="{r:.1f}" fill="{color}"/>'


#: reference vis.py:150-163 edge styling by relation kind
EDGE_STYLES = {
    "dep": {"color": "#d3d3d3", "width": 1},
    "inf": {"color": "hsl(289, 17%, 49%)", "width": 3},
    "syn": {"color": "hsl(55, 17%, 49%)", "width": 2},
}


def render_html(nodes: pd.DataFrame, edges: pd.DataFrame, *,
                width: int = 960, height: int = 720, seed: int = 42,
                title: str = "lemma graph") -> str:
    """Styled node/edge tables → one standalone HTML document (inline
    SVG, no external assets).  ``nodes`` needs ``key``; ``shape`` /
    ``color`` / ``size`` / ``text`` are honored when present (the
    ``compat.RenderPyVis.styled_nodes`` columns); ``edges`` needs
    ``src_key`` / ``dst_key`` and may carry ``kind`` / ``rel``."""
    laid = spring_layout(nodes, edges, seed=seed)
    pad = 40.0
    sx = lambda v: pad + float(v) * (width - 2 * pad)   # noqa: E731
    sy = lambda v: pad + float(v) * (height - 2 * pad)  # noqa: E731
    pos = {k: (sx(x), sy(y))
           for k, x, y in zip(laid["key"], laid["x"], laid["y"])}
    parts = [
        "<!DOCTYPE html>",
        f"<html><head><meta charset='utf-8'><title>{_html.escape(title)}"
        "</title></head><body>",
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
    ]
    for _, r in edges.iterrows():
        a, b = r.get("src_key"), r.get("dst_key")
        if a not in pos or b not in pos:
            continue
        style = EDGE_STYLES.get(str(r.get("kind", "")).lower(),
                                {"color": "#999", "width": 1})
        (x1, y1), (x2, y2) = pos[a], pos[b]
        rel = _html.escape(str(r.get("rel", "")))
        parts.append(
            f'<g><line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" '
            f'y2="{y2:.1f}" stroke="{style["color"]}" '
            f'stroke-width="{style["width"]}">'
            f"<title>{rel}</title></line></g>")
    for _, r in laid.iterrows():
        x, y = pos[r["key"]]
        size = float(r.get("size", 10.0) or 10.0)
        radius = max(4.0, min(24.0, size / 4.0))
        shape = str(r.get("shape", "dot"))
        color = str(r.get("color", "#999"))
        label = _html.escape(str(r.get("text", r["key"])))
        parts.append(
            f"<g>{_svg_shape(shape, x, y, radius, color)}"
            f"<title>{label}</title>"
            f'<text x="{x:.1f}" y="{y + radius + 11:.1f}" '
            f'font-size="9" text-anchor="middle" '
            f'font-family="sans-serif">{label}</text></g>')
    parts.append("</svg></body></html>")
    return "\n".join(parts)


def render_pyvis(nodes: pd.DataFrame, edges: pd.DataFrame, *,
                 height: int = 1200):
    """Build the real ``pyvis.network.Network`` (reference
    ``vis.py:136-164``) — importable only where pyvis is installed;
    raises ImportError otherwise (skip-tested in this container)."""
    from pyvis.network import Network  # gated — optional dependency

    net = Network(height=f"{height}px")
    keys = set(nodes["key"])
    for _, r in nodes.iterrows():
        net.add_node(r["key"], label=str(r.get("text", r["key"])),
                     shape=str(r.get("shape", "dot")),
                     color=str(r.get("color", "#999")),
                     size=float(r.get("size", 10.0) or 10.0))
    for _, r in edges.iterrows():
        if r["src_key"] in keys and r["dst_key"] in keys:
            style = EDGE_STYLES.get(str(r.get("kind", "")).lower())
            kw = {"title": str(r.get("rel", ""))}
            if style:
                kw["color"] = style["color"]
                kw["width"] = style["width"]
            net.add_edge(r["src_key"], r["dst_key"], **kw)
    return net


def write_lemma_graph_html(nodes: pd.DataFrame, edges: pd.DataFrame,
                           path: str, *, seed: int = 42) -> str:
    """Render to ``path``; prefers pyvis when importable, else the
    self-contained SVG emitter.  Returns the engine used."""
    try:
        net = render_pyvis(nodes, edges)
        net.write_html(path)
        return "pyvis"
    except ImportError:
        with open(path, "w", encoding="utf-8") as f:
            f.write(render_html(nodes, edges, seed=seed))
        return "svg"
