"""Grouped-aggregate pandas UDFs (the UDAF leg of SURVEY §2.K).

Same engine rule as the UDTF module: Catalyst aggregates are the hot
path; a GROUPED_AGG pandas UDF earns its place only when the aggregate
needs per-group imperative logic — here a trimmed mean, whose native
form needs a percentile pass plus a filtered re-aggregation, while the
UDAF computes it in one grouped Arrow batch. The parity test
(tests/test_udaf.py) pins the UDAF to the native two-step computation
so either implementation can serve either call site.
"""

# NOTE: no `from __future__ import annotations` here — it would turn the
# inner UDF's type hints into strings, which pyspark's pandas-UDF
# signature inference cannot resolve (UNSUPPORTED_SIGNATURE).
from functools import lru_cache


@lru_cache(maxsize=1)
def trimmed_mean_10():
    """10%-trimmed mean GROUPED_AGG pandas UDF: over the group's
    non-null AND non-NaN values, drop the lowest and highest decile by
    rank (floor count) and average the rest. Tiny groups fall back to
    their plain mean.

    NaN contract (review r6, 10th pass): Arrow maps Spark NULL to NaN
    in a float64 Series, so the two are INDISTINGUISHABLE here —
    ``dropna`` necessarily removes both. A native re-implementation
    must therefore filter ``isNotNull AND NOT isnan`` to match; a
    twin filtering nulls only would propagate a data NaN into its mean
    and diverge. (Pinned by test_trimmed_mean_udaf_drops_nan_values.)

    A factory (not a module-level decorator) because ``@pandas_udf``
    parses its DDL return type against the ACTIVE session — decorating
    at import time breaks any import that precedes session creation.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _trimmed_mean_10(v: pd.Series) -> float:
        a = np.sort(v.dropna().to_numpy(dtype="float64"))
        n = len(a)
        if n == 0:
            # NULL, not NaN: native Spark aggregates return NULL for an
            # all-null group, and NaN diverges from NULL in comparisons,
            # joins, and groupBy — the parity contract pins this.
            return None
        cut = int(n * 0.1)
        core = a[cut : n - cut] if n - 2 * cut > 0 else a
        return float(core.mean())

    return _trimmed_mean_10
