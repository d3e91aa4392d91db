"""Deterministic synthetic corpus generator (FIXTURES.md F5).

Emits the engine's canonical input table (BASELINE.json ``input_hint``)::

    documents(doc_id: string,
              spans: list<struct<kind, text, media_ref, offset:int32>>)

plus a ground-truth table mapping each entity mention to its canonical
entity id — the oracle for pairwise-F1 scoring of the clustering stage.

Properties (seed-fixed, parameterized by ``n_docs``):

- entity pool of ``n_docs // 10`` canonical two-token names; each doc
  mentions 1-4 entities as ``ent`` spans with surface-form variants
  (case changes, initials, one-edit typos) so Jaro-Winkler/Levenshtein
  scoring is exercised;
- every 7th doc carries a ``media`` span (``media_ref="m://<hash>"``,
  ``text=""``) whose synthetic embedding (hash-seeded vector, see
  ``stages/encode.py``) matches its entity's other mentions;
- one hot entity appears in 5% of all docs → a skewed block that the
  blocking stage must salt;
- filler ``lem``/``dep`` spans from a fixed vocabulary.

No external data; everything derives from ``seed``.
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa

from .schema import DOCUMENTS

# Curated, pairwise-distant name lists: the pool constraints below
# guarantee planted variants are unambiguous (Febrl-style synthetic ER
# benchmark design), so pairwise F1 against generator truth is a
# well-defined target.
_FIRST = ["Alice", "Armand", "Aiko", "Brandon", "Beatriz", "Bjorn", "Carla",
          "Chidi", "Casper", "Dmitri", "Dolores", "Declan", "Elena", "Ewan",
          "Esteban", "Farid", "Fumiko", "Fergus", "Grace", "Gunnar", "Giulia",
          "Hiro", "Henrike", "Hamza", "Ingrid", "Idris", "Ximena", "Jamal",
          "Johanna", "Jiro", "Katya", "Kwame", "Kerstin", "Liam", "Lucinda",
          "Leopold", "Mona", "Matteo", "Mirjam", "Nikhil", "Noelle", "Njord",
          "Olga", "Osman", "Orsolya", "Pedro", "Priya", "Quinn", "Quiteria",
          "Rosa", "Ruben", "Raisa", "Stefan", "Sakura", "Soren", "Tara",
          "Tobias", "Tsubasa", "Umar", "Ulrike", "Vera", "Vikram", "Walter",
          "Wanda", "Yusuf", "Yolanda", "Zelda", "Zoltan"]
_LAST = ["Abbott", "Brennan", "Castillo", "Dalton", "Eriksen", "Fontaine",
         "Gruber", "Hassan", "Ivanov", "Jensen", "Kowalski", "Lindqvist",
         "Moreau", "Novak", "Okafor", "Petrov", "Quintana", "Rossi", "Schmidt",
         "Takahashi", "Ueda", "Vargas", "Weber", "Xiong", "Yamada", "Zhang",
         "Adeyemi", "Bergstrom", "Carvalho", "Dubois", "Eklund", "Ferreira",
         "Galindo", "Horvath", "Iwasaki", "Jablonski", "Kapoor", "Lombardi",
         "Mendoza", "Nakamura", "Olofsson", "Pellegrini", "Quraishi", "Ramirez",
         "Sandoval", "Morozova", "Urbina", "Villanueva", "Watanabe", "Yilmaz",
         "Zielinski", "Acheampong", "Bhattacharya", "Csikos", "Dimitrov",
         "Engelbrecht", "Fitzgerald", "Gonzalez", "Haugland", "Iglesias",
         "Whitfield", "Krishnan", "Lefebvre", "Marchetti", "Nystrom",
         "Obrien", "Pacheco", "Rahimi", "Soderberg", "Thorvald", "Uchida",
         "Vasquez", "Wojcik", "Yoshida", "Zapatero"]

_FILLER_NOUNS = ["film", "project", "award", "studio", "career", "interview",
                 "festival", "archive", "journey", "letter", "report", "story"]
_FILLER_VERBS = ["directed", "visited", "founded", "studied", "wrote", "produced"]
_FILLER_DEPS = [("the", "DET"), ("a", "DET"), ("of", "ADP"), ("in", "ADP"),
                ("with", "ADP"), ("and", "CCONJ"), ("was", "AUX"), ("is", "AUX")]


MAX_POOL = 2500  # capacity bound of the unambiguous name space


def canonical_entities(n: int, rng: random.Random) -> list[str]:
    """Entity pool with unambiguity constraints: full name unique AND
    (first-initial, last) unique — so an initial variant "F. Last" maps
    to exactly one pool entity and same-last entities always differ in
    first initial (keeps the alias rule precision-safe)."""
    n = min(n, MAX_POOL)
    seen: set[str] = set()
    initial_last: set[tuple[str, str]] = set()
    out: list[str] = []
    attempts = 0
    while len(out) < n and attempts < 200 * n:
        attempts += 1
        first = rng.choice(_FIRST)
        last = rng.choice(_LAST)
        name = f"{first} {last}"
        il = (first[0], last)
        if name in seen or il in initial_last:
            continue
        seen.add(name)
        initial_last.add(il)
        out.append(name)
    return out


def variant_of(name: str, rng: random.Random) -> str:
    """Deterministic surface-form variant: identity, case change,
    initial, or a one-edit typo in the last name (interior position,
    only when long enough to stay unambiguous)."""
    kind = rng.randrange(6)
    first, last = name.split(" ", 1)
    if kind <= 1:
        return name                       # exact
    if kind == 2:
        return name.upper()               # case variant
    if kind == 3:
        return f"{first[0]}. {last}"      # initial
    if kind == 4:                         # one-char deletion typo in last name
        if len(last) > 5:
            i = rng.randrange(1, len(last) - 1)
            return f"{first} {last[:i] + last[i + 1:]}"
        return name
    # transposition typo
    if len(last) > 5:
        i = rng.randrange(1, len(last) - 2)
        swapped = last[:i] + last[i + 1] + last[i] + last[i + 2:]
        return f"{first} {swapped}"
    return name


def media_ref_for(entity: str) -> str:
    return "m://" + hashlib.sha1(entity.encode("utf-8")).hexdigest()[:16]


def generate(n_docs: int, *, seed: int = 42, filler_spans: int = 0,
             pool_docs: int | None = None, doc_offset: int = 0,
             doc_seed: int | None = None
             ) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Return ``(documents, truth, assets)`` tables.

    ``truth(doc_id, offset, entity_id, surface)`` labels every ``ent``
    and ``media`` span with its canonical entity index.

    ``assets(media_ref, payload)`` is the opaque media store: the
    decode STUB (``stages/encode.MediaDecodeStub``) "decodes" a payload
    back to text deterministically — standing in for image/audio
    decoding libraries absent from this container.

    ``filler_spans`` appends that many extra dep/lem filler spans per
    document — web-document-sized inputs for scaling benchmarks, where
    per-doc extraction compute must dominate fixed stage costs (real
    docs are hundreds of tokens, not ten).
    """
    pool = canonical_entities(max(2, (pool_docs or n_docs) // 10),
                              random.Random(seed))
    rng = random.Random(seed if doc_seed is None else doc_seed)
    n_ents = len(pool)
    hot_idx = 0  # pool[0] is the hot entity (5% of docs)

    doc_ids: list[str] = []
    span_col: list[list[dict]] = []
    t_doc: list[str] = []
    t_off: list[int] = []
    t_ent: list[int] = []
    t_surface: list[str] = []

    for d in range(n_docs):
        doc_id = f"doc-{seed}-{doc_offset + d:08d}"
        n_mentions = rng.randrange(1, 5)
        ents = [rng.randrange(n_ents) for _ in range(n_mentions)]
        if rng.random() < 0.05:
            ents[0] = hot_idx
        spans: list[dict] = []
        offset = 0

        def emit(kind: str, text: str, media_ref: str = "") -> int:
            nonlocal offset
            spans.append({"kind": kind, "text": text,
                          "media_ref": media_ref, "offset": offset})
            o = offset
            offset += max(1, len(text.split(" ")))
            return o

        for m, ent_idx in enumerate(ents):
            surface = variant_of(pool[ent_idx], rng)
            # filler prefix: dep + lem spans
            w, p = rng.choice(_FILLER_DEPS)
            emit("dep", w)
            emit("lem", rng.choice(_FILLER_NOUNS))
            o = emit("ent", surface)
            t_doc.append(doc_id); t_off.append(o)
            t_ent.append(ent_idx); t_surface.append(surface)
            emit("lem", rng.choice(_FILLER_VERBS))

        if d % 7 == 0:
            ent_idx = ents[0]
            o = emit("media", "", media_ref_for(pool[ent_idx]))
            t_doc.append(doc_id); t_off.append(o)
            t_ent.append(ent_idx); t_surface.append("")

        for _ in range(filler_spans):
            if rng.random() < 0.5:
                w, _p = rng.choice(_FILLER_DEPS)
                emit("dep", w)
            else:
                emit("lem", rng.choice(_FILLER_NOUNS))

        doc_ids.append(doc_id)
        span_col.append(spans)

    documents = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": span_col}, schema=DOCUMENTS
    )
    truth = pa.table({
        "doc_id": pa.array(t_doc, pa.string()),
        "offset": pa.array(t_off, pa.int32()),
        "entity_id": pa.array(t_ent, pa.int64()),
        "surface": pa.array(t_surface, pa.string()),
    })
    assets = pa.table({
        "media_ref": pa.array([media_ref_for(e) for e in pool], pa.string()),
        "payload": pa.array([e.encode("utf-8") for e in pool], pa.binary()),
    })
    return documents, truth, assets


def _write_shard(args: tuple) -> str:
    out_dir, shard, n, seed, filler, pool_docs, offset = args
    import pyarrow.parquet as pq

    docs, truth, _ = generate(n, seed=seed, filler_spans=filler,
                              pool_docs=pool_docs, doc_offset=offset,
                              doc_seed=seed * 100003 + shard)
    pq.write_table(docs, f"{out_dir}/documents-{shard:05d}.parquet")
    truth_path = f"{out_dir}/truth-{shard:05d}.parquet"
    pq.write_table(truth, truth_path)
    return truth_path


def write_corpus(out_dir: str, n_docs: int, *, seed: int = 42,
                 shards: int = 8, filler_spans: int = 0) -> None:
    """Write a sharded parquet corpus (one file per shard so reads
    parallelize and a resumable run can skip finished shards).

    Shards are generated in parallel worker processes, each with a
    deterministic (seed, shard) RNG and the SHARED entity pool derived
    from (seed, n_docs) — byte-stable output for a given argument
    tuple, ~cores× faster generation for scaling-bench corpora."""
    import multiprocessing as mp
    import os
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    per = max(1, (n_docs + shards - 1) // shards)
    jobs = []
    off = 0
    shard = 0
    while off < n_docs:
        n = min(per, n_docs - off)
        jobs.append((out_dir, shard, n, seed, filler_spans, n_docs, off))
        off += n
        shard += 1

    if n_docs >= 50_000 and len(jobs) > 1:
        # SPAWN, not fork: callers (bench.py, the driver) have already
        # imported ray, whose import starts background threads — fork
        # from a threaded process inherits locked mutexes and the
        # worker pool deadlocks on futexes (observed hanging a 3.2M-doc
        # generation at 32 workers).  Spawned workers re-import the
        # package cleanly; output is byte-identical either way.
        with mp.get_context("spawn").Pool(
                min(len(jobs), os.cpu_count() or 8)) as pool:
            truth_paths = pool.map(_write_shard, jobs)
    else:
        truth_paths = [_write_shard(j) for j in jobs]

    truth = pa.concat_tables([pq.read_table(p) for p in truth_paths])
    pq.write_table(truth, f"{out_dir}/truth.parquet")
    for p in truth_paths:
        os.remove(p)
    _, _, assets = generate(2, seed=seed, pool_docs=n_docs)
    pq.write_table(assets, f"{out_dir}/assets.parquet")
