"""KMV (bottom-k) mergeable quantile sketch.

The partials-as-rows discipline of `functions/sketch.py` (HLL), applied
to quantiles: each block contributes the k rows whose HASHED key is
smallest — a deterministic uniform sample of the key population,
because a stable integer hash induces a uniform random order on keys.
"bottom-k of the union == union of the bottom-k's" makes the merge a
plain sort+head (associative, idempotent under replay of the same
rows), so the exchange carries ≤ k rows per (group, block) at any
corpus size, and the final quantile is read off the merged sample.

Accuracy: a uniform sample of size k estimates any quantile with
standard error ≈ sqrt(q(1-q)/k) in rank space (~1.6% of rank at
k = 1024, q = 0.5) — bounded by `tests/test_sketch.py`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: sample size per group; exchange is ≤ KMV_K rows per (group, block)
KMV_K = 1024

QS = (0.5, 0.9, 0.99)


def kmv_merge_quantiles(g: pd.DataFrame) -> pd.DataFrame:
    """Merge one group's per-block bottom-k partials and interpolate
    the target quantiles from the surviving global bottom-k sample."""
    g = g.nsmallest(KMV_K, "h")
    v = np.sort(g["v"].to_numpy(dtype=np.float64))
    out = {"lang": [g["lang"].iloc[0]], "sample_n": [len(v)]}
    for q in QS:
        out[f"p{int(q * 100)}"] = [
            float(np.quantile(v, q, method="linear")) if len(v) else np.nan
        ]
    return pd.DataFrame(out)
