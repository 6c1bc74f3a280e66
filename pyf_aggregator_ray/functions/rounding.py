"""Cross-engine-deterministic score rounding.

numpy rounds half-to-even, DuckDB half-away-from-zero — quality scores
built from small rationals land exactly on .5 boundaries often enough to
break value-hash comparisons. Both sides therefore use the SAME floor
formula (np.floor === SQL floor on identical float64 inputs):

    round6(x) = floor(x * 1e6 + 0.5) / 1e6
"""

from __future__ import annotations

import numpy as np


def round6(x) -> np.ndarray | float:
    arr = np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6
    return float(arr) if np.ndim(x) == 0 else arr


def sql_round6(expr: str) -> str:
    return f"floor(({expr}) * 1000000 + 0.5) / 1000000"
