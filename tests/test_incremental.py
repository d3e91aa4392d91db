"""Incremental ER: folding a delta into prior state must reproduce the
batch result (split-invariance), and old-old pairs must not rescore."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def _clusters_of(df):
    """Canonical partition: frozenset of frozensets of keys."""
    groups: dict = {}
    for k, c in zip(df["key"], df["cluster_id"]):
        groups.setdefault(c, set()).add(k)
    return frozenset(frozenset(v) for v in groups.values())


def test_incremental_matches_batch(tmp_path):
    from textgraphs_ray.corpus import generate
    from textgraphs_ray.pipelines.er import resolve_entities
    from textgraphs_ray.pipelines.er_incremental import (
        resolve_entities_incremental)

    docs, _, assets = generate(1000)
    batch = resolve_entities(rd.from_arrow(docs), assets=assets,
                             num_partitions=4)["clusters"].to_pandas()

    state = str(tmp_path / "er_state")
    first = resolve_entities_incremental(
        rd.from_arrow(docs.slice(0, 600)), state, assets=assets,
        num_partitions=4)
    inc = resolve_entities_incremental(
        rd.from_arrow(docs.slice(600, 400)), state, assets=assets,
        num_partitions=4)["clusters"].to_pandas()

    assert _clusters_of(inc) == _clusters_of(batch)
    # the first call resolved only the first split
    assert first["clusters"].count() < len(batch)


def test_incremental_empty_then_full(tmp_path):
    """Folding the whole corpus as one delta into empty state equals
    the batch path exactly."""
    from textgraphs_ray.corpus import generate
    from textgraphs_ray.pipelines.er import resolve_entities
    from textgraphs_ray.pipelines.er_incremental import (
        resolve_entities_incremental)

    docs, _, assets = generate(400)
    batch = resolve_entities(rd.from_arrow(docs), assets=assets,
                             num_partitions=4)["clusters"].to_pandas()
    inc = resolve_entities_incremental(
        rd.from_arrow(docs), str(tmp_path / "s"), assets=assets,
        num_partitions=4)["clusters"].to_pandas()
    assert _clusters_of(inc) == _clusters_of(batch)
