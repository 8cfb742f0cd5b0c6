"""The __spark_entry__ driver contract, tested locally: entry() runs and
returns rows with a stable schema, and the two rotated registries expose
the SAME keys in the SAME order — the driver zips queries() against
oracle_sql() positionally when it builds its per-round window, so an
order divergence would attest query A against oracle B."""

from __future__ import annotations

import importlib
import sys


def _entry_module():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as mod

    return importlib.reload(mod)


def test_entry_returns_rows_with_stable_schema(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    schema_before = df.schema.simpleString()
    assert df.count() > 0
    assert mod.entry(spark).schema.simpleString() == schema_before


def test_rotations_agree_and_cover_the_registry(spark):
    mod = _entry_module()
    q = list(mod.queries())
    o = list(mod.oracle_sql())
    from oic_options_chains_spark.queries import ORACLE, QUERIES

    assert set(q) == set(QUERIES)
    assert set(o) == set(ORACLE)
    # the registries must be IDENTICAL lists, not merely consistently
    # ordered: a query that lost its oracle would shift every later
    # positional pairing while relative-order checks still passed
    assert q == o
    # rotation is deterministic across calls within a round
    assert list(mod.queries()) == q
