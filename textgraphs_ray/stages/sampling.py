"""Deterministic weighted (importance) sampling for corpus curation.

Domain/quality reweighting (DSIR/DoReMi-style mixture shaping) needs a
sampler that (a) keeps a row with a per-row probability, (b) is
reproducible across reruns, block layouts and cluster sizes, and (c)
never coordinates between workers.  The standard trick: derive a
uniform [0,1) variate from a content hash of the row's key and keep the
row iff ``u < p_keep``.  No RNG state, no shuffle, one stateless
``map_batches`` — every worker makes the same decision for the same
row, so resumed or re-sharded runs select identical samples.

``md5`` (first 8 hex chars → /2^32) is used as the variate so the
sample is *SQL-reproducible* — the DuckDB oracle replays the exact
selection (same convention as ``det_sample`` / ``functions/bottomk``).
At production scale swap :func:`md5_frac` for the keyed siphash in
``functions/sketch.hash64`` when oracle parity is not needed; the
selection logic is unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


def md5_frac(keys: list) -> np.ndarray:
    """Per-key uniform [0,1) variate: first 8 md5 hex chars / 2^32.

    Matches SQL ``('0x' || substr(md5(k::VARCHAR), 1, 8))::UBIGINT /
    4294967296.0`` exactly (both sides do the same double division)."""
    return np.fromiter(
        (int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) / 2**32
         for k in keys), np.float64, count=len(keys))


def importance_sample(ds: "ray.data.Dataset", *, prob_col: str,
                      id_col: str = "doc_id") -> "ray.data.Dataset":
    """Keep each row iff ``md5_frac(id) < row[prob_col]``.

    ``prob_col`` holds the per-row keep probability in [0,1], computed
    upstream by any vectorized expression (quality score, domain
    weight, length prior...).  Expected sample size is
    ``sum(prob_col)``; the realized sample is deterministic."""

    def keep(t: pa.Table) -> pa.Table:
        u = md5_frac(t.column(id_col).to_pylist())
        p = np.asarray(t.column(prob_col).to_numpy(zero_copy_only=False),
                       np.float64)
        return t.filter(pa.array(u < p))

    return ds.map_batches(keep, batch_format="pyarrow")
