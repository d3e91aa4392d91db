"""BPE merge learning — tokenizer training over the corpus.

The byte-pair-encoding merge list (Sennrich et al. 2016) is the
tokenizer-training step of every LLM data stack.  The shape that
matters at 100 TB: the CORPUS reduces once to a (word, count) table —
the same combiner-fed groupby as ``tfidf.term_counts`` — and the merge
loop then runs over the DISTINCT-WORD table, never the corpus again.

Two loop plans, threshold-switched like every two-plan operator here:

- **driver** (vocab ≲ ``driver_vocab_max`` distinct words — natural
  language): the (word, count) table folds into memory and the classic
  loop runs locally.  This is what production tokenizer trainers do
  (the vocab is million-scale even for trillion-token corpora).
- **distributed** (``driver_vocab_max=0`` forces it): the symbolized
  vocab stays a Dataset; each round one ``map_batches`` emits partial
  adjacent-pair counts, one groupby-sum reduces them, the argmax pair
  (count desc, pair asc — deterministic) broadcasts back, and a
  stateless scan applies the merge.  ``repartition`` + ``materialize``
  per round caps block-count growth (the iterative-loop invariant,
  CLAUDE.md).

Both plans emit the identical merge table (parity pinned in
tests/test_bpe.py); pair counting is weighted by word frequency and
counts every adjacent occurrence (``aaa`` → (a,a) twice), ties break
lexicographically.  The FIRST merge is additionally hash-verified
against a DuckDB oracle (``bpe_first_merge``); the full loop is
brute-force-parity pytest-tested (SQL cannot replay an iterative
merge).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from .tfidf import term_counts

_MERGE_SCHEMA = pa.schema([("step", pa.int64()), ("lhs", pa.string()),
                           ("rhs", pa.string()),
                           ("merged", pa.string()),
                           ("count", pa.int64())])


def _pair_counts(syms_list, counts) -> Counter:
    pc: Counter = Counter()
    for syms, n in zip(syms_list, counts):
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += int(n)
    return pc


def _apply_merge(syms, a: str, b: str):
    """Merge every adjacent (a, b) left-to-right in one symbol list."""
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _best_pair(pc: Counter, min_pair_count: int):
    best = None
    for pair, n in pc.items():
        if n < min_pair_count:
            continue
        if (best is None or n > best[1]
                or (n == best[1] and pair < best[0])):
            best = (pair, n)
    return best


def bpe_learn(ds: "ray.data.Dataset", *, text_col: str = "text",
              n_merges: int = 20, min_pair_count: int = 2,
              driver_vocab_max: int = 2_000_000,
              num_blocks: int = 16) -> "ray.data.Dataset":
    """→ (step, lhs, rhs, merged, count): the learned BPE merge list
    in order.  Stops early when no pair reaches ``min_pair_count``.
    Physical plans per module doc; force the distributed loop with
    ``driver_vocab_max=0``.
    """
    vocab = term_counts(ds, text_col=text_col).materialize()

    if vocab.count() <= driver_vocab_max:
        rows = vocab.take_all()
        syms_list = [list(r["term"]) for r in rows]
        counts = [int(r["n"]) for r in rows]
        merges = []
        for step in range(n_merges):
            best = _best_pair(_pair_counts(syms_list, counts),
                              min_pair_count)
            if best is None:
                break
            (a, b), n = best
            merges.append((step, a, b, a + b, n))
            syms_list = [_apply_merge(s, a, b) if len(s) > 1 else s
                         for s in syms_list]
        return ray.data.from_arrow(pa.Table.from_pylist(
            [dict(zip(("step", "lhs", "rhs", "merged", "count"), m))
             for m in merges], schema=_MERGE_SCHEMA))

    # distributed loop over the symbolized vocab Dataset
    def symbolize(t: pa.Table) -> pa.Table:
        terms = t.column("term").to_pylist()
        return pa.table({
            "syms": pa.array([list(w) for w in terms],
                             pa.list_(pa.string())),
            "n": t.column("n")})

    state = (vocab.map_batches(symbolize, batch_format="pyarrow")
             .repartition(num_blocks).materialize())
    merges = []
    for step in range(n_merges):
        def partial(t: pa.Table) -> pa.Table:
            pc = _pair_counts(t.column("syms").to_pylist(),
                              t.column("n").to_numpy(
                                  zero_copy_only=False))
            keys = list(pc.keys())
            return pa.table({
                "lhs": pa.array([k[0] for k in keys], pa.string()),
                "rhs": pa.array([k[1] for k in keys], pa.string()),
                "c": pa.array(list(pc.values()), pa.int64())})

        agg = (state.map_batches(partial, batch_format="pyarrow")
               .groupby(["lhs", "rhs"])
               .aggregate(Sum("c", alias_name="c")))
        top = (agg.filter(expr=f"c >= {int(min_pair_count)}")
               .sort(["c", "lhs", "rhs"],
                     descending=[True, False, False]).limit(1)
               .take_all())
        if not top:
            break
        a, b, n = top[0]["lhs"], top[0]["rhs"], int(top[0]["c"])
        merges.append((step, a, b, a + b, n))

        def apply(t: pa.Table, a=a, b=b) -> pa.Table:
            syms = [(_apply_merge(s, a, b) if len(s) > 1 else s)
                    for s in t.column("syms").to_pylist()]
            return pa.table({
                "syms": pa.array(syms, pa.list_(pa.string())),
                "n": t.column("n")})

        state = (state.map_batches(apply, batch_format="pyarrow")
                 .repartition(num_blocks).materialize())

    return ray.data.from_arrow(pa.Table.from_pylist(
        [dict(zip(("step", "lhs", "rhs", "merged", "count"), m))
         for m in merges], schema=_MERGE_SCHEMA))


def bpe_encode(ds: "ray.data.Dataset", merges, *,
               text_col: str = "text",
               id_col: str = "doc_id") -> "ray.data.Dataset":
    """→ (doc_id, n_tokens): token count per document under a learned
    merge list — the "how many tokens is my corpus" accounting pass.
    ``merges`` is the Dataset/list produced by :func:`bpe_learn`; the
    (tiny) merge list broadcasts once and each doc's words encode via
    the standard rank-greedy loop, memoized per distinct word within a
    batch.
    """
    if hasattr(merges, "take_all"):
        merges = merges.take_all()
    ranked = {(m["lhs"], m["rhs"]): i for i, m in enumerate(merges)}
    ref = ray.put(ranked)

    def encode(t: pa.Table) -> pa.Table:
        import re
        rk = ray.get(ref)
        cache: dict[str, int] = {}

        def n_tokens(w: str) -> int:
            if w in cache:
                return cache[w]
            syms = list(w)
            while len(syms) > 1:
                pairs = [(rk.get((x, y), None), i) for i, (x, y)
                         in enumerate(zip(syms, syms[1:]))]
                cand = [(r, i) for r, i in pairs if r is not None]
                if not cand:
                    break
                r, _ = min(cand)
                a, b = None, None
                for rr, i in cand:
                    if rr == r:
                        a, b = syms[i], syms[i + 1]
                        break
                syms = _apply_merge(syms, a, b)
            cache[w] = len(syms)
            return cache[w]

        word = re.compile(r"[a-z]+")
        ids, ns = [], []
        for did, txt in zip(t.column(id_col).to_pylist(),
                            t.column(text_col).to_pylist()):
            ids.append(did)
            ns.append(sum(n_tokens(w)
                          for w in word.findall((txt or "").lower())))
        return pa.table({"doc_id": pa.array(ids),
                         "n_tokens": pa.array(ns, pa.int64())})

    return ds.map_batches(encode, batch_format="pyarrow")
