"""Pluggable stage registry — the engine's user-extension surface
(SURVEY.md §2.10).

The reference exposes four extension points: spaCy pipeline components
(``Component.augment_pipe``, pipe.py:36-52), knowledge-graph wrappers
(``KnowledgeGraph``, pipe.py:55-158), relation-inference models
(``InferRel``, pipe.py:161-209), and factory dependency injection
(``PipelineFactory``, pipe.py:440-511).

Here every plugin is a ``map_batches`` callable plus a resource spec:

- an **extractor** turns raw documents into the canonical spans table;
- a **linker** turns distinct node keys into link rows;
- a **scorer** turns candidate pairs into match edges;
- an **inferrer** turns documents into INF edge rows.

``StageSpec.apply(ds)`` is sugar for
``ds.map_batches(cls, batch_format="pyarrow", concurrency=..., ...)``
so a registered plugin drops into any pipeline unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data


@dataclass(frozen=True)
class StageSpec:
    """A batch transform + the resources it needs."""

    fn: Callable  # callable class (actor pool) or plain fn (tasks)
    batch_size: int | None = None
    concurrency: Any = (1, 4)
    num_cpus: float = 1.0
    num_gpus: float = 0.0
    kwargs: dict = field(default_factory=dict)

    def apply(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        opts: dict[str, Any] = {"batch_format": "pyarrow",
                                "num_cpus": self.num_cpus}
        if self.batch_size is not None:
            opts["batch_size"] = self.batch_size
        if isinstance(self.fn, type):  # callable class → actor pool
            opts["concurrency"] = self.concurrency
            if self.kwargs:
                opts["fn_constructor_kwargs"] = self.kwargs
        if self.num_gpus:
            opts["num_gpus"] = self.num_gpus
        return ds.map_batches(self.fn, **opts)


class Registry:
    """Named registries for each extension point."""

    def __init__(self) -> None:
        self.extractors: dict[str, StageSpec] = {}
        self.linkers: dict[str, StageSpec] = {}
        self.scorers: dict[str, StageSpec] = {}
        self.inferrers: dict[str, StageSpec] = {}

    def _install_defaults(self) -> None:
        from .stages.extract import ExtractSpans, Spanify
        from .stages.link import EntityLinker
        from .stages.relations import RelationScorer
        from .stages.scoring import PairScorer

        self.extractors.setdefault("spanify", StageSpec(Spanify, batch_size=256))
        self.extractors.setdefault("spans", StageSpec(ExtractSpans,
                                                      batch_size=256))
        # real-model path, gated on the package actually importing
        # (mirrors viz.py's networkx gate; reference factory
        # pipe.py:440-511) — when spacy exists the model extractor is a
        # registry lookup away, and the rule stand-in stays the default
        from .stages.spacy_extract import HAVE_SPACY
        if HAVE_SPACY:
            from .stages.spacy_extract import SpacyExtractor
            self.extractors.setdefault(
                "spacy", StageSpec(SpacyExtractor, batch_size=64))
        from .stages.relations import HAVE_OPENNRE, HAVE_TRANSFORMERS
        if HAVE_OPENNRE:
            from .stages.relations import OpenNREScorer
            self.inferrers.setdefault(
                "opennre", StageSpec(OpenNREScorer, batch_size=64))
        if HAVE_TRANSFORMERS:
            from .stages.relations import RebelGenerator
            self.inferrers.setdefault(
                "mrebel", StageSpec(RebelGenerator, batch_size=16))
        self.linkers.setdefault("local-kg", StageSpec(EntityLinker))
        self.scorers.setdefault("string-sim", StageSpec(PairScorer,
                                                        batch_size=8192))
        self.inferrers.setdefault("verb-window", StageSpec(RelationScorer,
                                                           batch_size=256))


registry = Registry()
registry._install_defaults()


def register_extractor(name: str, spec: StageSpec) -> None:
    registry.extractors[name] = spec


def register_linker(name: str, spec: StageSpec) -> None:
    registry.linkers[name] = spec


def register_scorer(name: str, spec: StageSpec) -> None:
    registry.scorers[name] = spec


def register_inferrer(name: str, spec: StageSpec) -> None:
    registry.inferrers[name] = spec
