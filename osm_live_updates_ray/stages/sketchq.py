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
    the target quantiles from the surviving global bottom-k sample.
    The sample is DETERMINISTIC (bottom-k by the splitmix64 hash of
    doc_id, a bijection so hashes never tie), which is what makes the
    sketch ORACLE-CHECKABLE: the same sample is expressible in SQL."""
    g = g.nsmallest(KMV_K, "h")
    v = np.sort(g["v"].to_numpy(dtype=np.float64))
    out = {"lang": [g["lang"].iloc[0]], "sample_n": [np.int64(len(v))]}
    for q in QS:
        out[f"p{int(q * 100)}"] = [
            float(np.round(np.quantile(v, q, method="linear"), 4))
            if len(v) else np.nan
        ]
    return pd.DataFrame(out)


def splitmix64_sql(expr: str) -> str:
    """DuckDB expression reproducing functions/hashing.hash_int64
    (splitmix64) bit-exactly over HUGEINT mod-2^64 arithmetic; the
    64×64 multiplies are split into 32-bit halves so no intermediate
    overflows INT128 (verified equal to the numpy kernel)."""
    M = 18446744073709551616  # 2^64
    def mul(a: str, c: int) -> str:
        cl, ch = c & 0xFFFFFFFF, c >> 32
        return (
            f"((({a} % 4294967296) * {cl} + "
            f"((({a} % 4294967296) * {ch} + ({a} // 4294967296) * {cl})"
            f" % 4294967296) * 4294967296) % {M})"
        )
    f0 = f"((CAST({expr} AS HUGEINT) + 11400714819323198485) % {M})"
    f1 = f"CAST(xor(CAST({f0} AS UBIGINT), CAST({f0} AS UBIGINT) >> 30) AS HUGEINT)"
    f2 = mul(f1, 0xBF58476D1CE4E5B9)
    f3 = f"CAST(xor(CAST({f2} AS UBIGINT), CAST({f2} AS UBIGINT) >> 27) AS HUGEINT)"
    f4 = mul(f3, 0x94D049BB133111EB)
    return f"xor(CAST({f4} AS UBIGINT), CAST({f4} AS UBIGINT) >> 31)"
