"""Clustering evaluation: vectorized pairwise precision/recall/F1.

The north rule's acceptance metric is pairwise F1 on labeled pairs
(truth entity id vs predicted cluster id).  The naive O(n²) pair loop
is fine for unit tests but not for benchmark corpora, so this uses the
standard contingency identity: with n_ec = |truth e ∩ cluster c|,

    TP        = Σ_{e,c} C(n_ec, 2)
    pred pairs = Σ_c C(n_c, 2)
    true pairs = Σ_e C(n_e, 2)

— three pandas groupbys, O(n).
"""

from __future__ import annotations

import pandas as pd


def _c2(sizes) -> int:
    return int((sizes * (sizes - 1) // 2).sum())


def pairwise_scores(df: pd.DataFrame, *, truth_col: str = "entity_id",
                    pred_col: str = "cluster_id"
                    ) -> tuple[float, float, float]:
    """→ (precision, recall, f1) over all labeled pairs."""
    tp = _c2(df.groupby([truth_col, pred_col]).size())
    pred = _c2(df.groupby(pred_col).size())
    true = _c2(df.groupby(truth_col).size())
    prec = tp / max(1, pred)
    rec = tp / max(1, true)
    return prec, rec, 2 * prec * rec / max(1e-9, prec + rec)


def er_f1_against_truth(spans_df: pd.DataFrame, clusters_df: pd.DataFrame,
                        truth_df: pd.DataFrame) -> tuple[float, float, float]:
    """Join truth (doc_id, offset, entity_id) → span lemma_key →
    predicted cluster, then score distinct surface forms pairwise."""
    m = truth_df.merge(spans_df[["doc_id", "offset", "lemma_key"]],
                       on=["doc_id", "offset"], how="left")
    m = m.merge(clusters_df, left_on="lemma_key", right_on="key",
                how="left")
    keys = m.drop_duplicates("lemma_key")
    return pairwise_scores(keys)
