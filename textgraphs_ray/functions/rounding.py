"""DuckDB-compatible decimal rounding.

``np.round`` banker-rounds (ties to even) while DuckDB's ``round``
rounds ties AWAY from zero.  The two diverge exactly when the value
is a dyadic rational whose decimal expansion terminates at the tie
digit — e.g. −225/5760 = −5/128 = −0.0390625, where ``np.round(x, 6)``
gives −0.039062 but DuckDB gives −0.039063 (observed: the one
`autocorr` row at sf0.1).  Any 6dp-rounded RATIONAL output column
(integer-ratio divisions: Jaccard, clustering coefficient, rich-club
φ, diversity ratios, correlation with perfect-square variances) can
hit such ties; irrational outputs (square roots, logs) cannot.

Use :func:`round_half_away` for those columns so the value-hash gate
is tie-robust instead of data-lucky.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 6):
    """Element-wise round-half-away-from-zero, matching DuckDB's
    ``round(x, decimals)`` on every tie."""
    f = 10.0 ** decimals
    x = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(x) * f + 0.5), x) / f
