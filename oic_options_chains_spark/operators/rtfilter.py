"""Runtime bucket-filter join — a Bloom-style pre-shuffle prune for
fact⋈dim joins whose dim side is too big to broadcast but whose JOIN-KEY
FOOTPRINT compresses to a tiny bucket set.

At 100 TB the expensive part of `orders ⋈ customers(segment)` is
shuffling every orders row; most of them join to nothing once the dim is
filtered. Spark's own runtime row-level filters do this opportunistically
(spark.sql.optimizer.runtime.bloomFilter.enabled); this operator is the
explicit, always-on form:

  1. collapse the (filtered) dim side to `distinct(hash(key) mod m)` —
     at most ``m`` rows regardless of dim size (one narrow aggregate);
  2. broadcast that bucket relation and LEFT SEMI join the fact on its
     own key's bucket — fact rows whose bucket never occurs on the dim
     side are dropped BEFORE the join shuffle;
  3. run the exact equi-join on the survivors.

Correctness is pruning-only by construction: every fact row whose key
exists on the dim side hashes into an occupied bucket (never wrongly
dropped), and false-positive survivors are removed by the exact join in
step 3. The hash therefore needs no cross-engine agreement — an oracle
is simply the plain join — and ``xxhash64`` (JVM, whole-stage codegen)
is the right choice.

Selectivity: with ``d`` distinct dim keys, the expected kept fraction of
non-matching fact rows is ~``1 - (1 - 1/m)^d`` (≈ d/m for d ≪ m); size
``m`` a few × the filtered dim's distinct-key count. The bucket relation
is ≤ m rows of one bigint — broadcast cost is bounded by the PARAMETER,
not by data size, which is the property a plain broadcast join lacks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rf_bucket"


def _bucket(key: Column, m: int) -> Column:
    return F.pmod(F.xxhash64(key), F.lit(int(m)))


def runtime_filter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = 1 << 16,
    how: str = "inner",
) -> DataFrame:
    """``fact ⋈ dim`` on ``fact_key = dim_key`` with a broadcast bucket
    pre-filter on the fact side. ``how`` supports the equi-join types
    whose result is a subset of the inner join's fact rows ("inner",
    "left_semi"); anything preserving unmatched fact rows would make the
    prune wrong, so it is rejected."""
    if how not in ("inner", "left_semi"):
        raise ValueError(f"runtime_filter_join: unsupported join type {how!r}")
    buckets = (
        dim.select(_bucket(F.col(dim_key), m).alias(_BUCKET))
        .distinct()
    )
    pruned = fact.join(
        F.broadcast(buckets),
        _bucket(fact[fact_key], m) == F.col(_BUCKET),
        "left_semi",
    )
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
