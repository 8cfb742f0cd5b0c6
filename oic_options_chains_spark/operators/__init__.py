"""Relational building blocks (SURVEY.md sections 2.1-2.7).

Each operator is a pure ``DataFrame -> DataFrame`` function so Catalyst can
fuse it into the surrounding plan; none collects to the driver.
"""

from oic_options_chains_spark.operators.asof import asof_join, latest_per_key
from oic_options_chains_spark.operators.dedup import (
    conflict_ignore_append,
    dedup_by_key,
)
from oic_options_chains_spark.operators.merge import upsert
from oic_options_chains_spark.operators.nearest import nearest_selection
from oic_options_chains_spark.operators.validate import fk_violations

__all__ = [
    "asof_join",
    "latest_per_key",
    "nearest_selection",
    "dedup_by_key",
    "conflict_ignore_append",
    "upsert",
    "fk_violations",
]
