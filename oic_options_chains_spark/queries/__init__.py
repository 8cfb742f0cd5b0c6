"""t2 query registry: every operator from SURVEY.md section 2 as a named
(spark_query, oracle_sql) pair over the synthetic tables.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLE[name]`` is the
equivalent DuckDB SQL. Column names and pinned output types match on both
sides so the driver's order-insensitive value hash compares exactly
(see FIXTURES.md section 2 for the domain -> synthetic mapping).
"""

from oic_options_chains_spark.queries.registry import ORACLE, QUERIES, register

# Import for registration side effects.
from oic_options_chains_spark.queries import clustering as _clustering  # noqa: E402,F401
from oic_options_chains_spark.queries import core as _core  # noqa: E402,F401
from oic_options_chains_spark.queries import corpus as _corpus  # noqa: E402,F401
from oic_options_chains_spark.queries import curation as _curation  # noqa: E402,F401
from oic_options_chains_spark.queries import events as _events  # noqa: E402,F401
from oic_options_chains_spark.queries import extensions as _extensions  # noqa: E402,F401
from oic_options_chains_spark.queries import layout as _layout  # noqa: E402,F401
from oic_options_chains_spark.queries import lm as _lm  # noqa: E402,F401
from oic_options_chains_spark.queries import maintenance as _maintenance  # noqa: E402,F401
from oic_options_chains_spark.queries import profiling as _profiling  # noqa: E402,F401
from oic_options_chains_spark.queries import scale as _scale  # noqa: E402,F401
from oic_options_chains_spark.queries import selection as _selection  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "register"]
