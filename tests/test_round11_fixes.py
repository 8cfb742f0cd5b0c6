"""Round-11 ADVICE fixes, pinned by test.

1. ``table_row_count`` URI normalization: Spark-canonical single-slash
   ``file:/p`` and any case of the scheme (``FILE://``) resolve to the
   local-footer branch (ADVICE r10 item 1).
2. ``_sql_states`` falls back to the message scan whenever the java
   chain walk yields an EMPTY state set — not only when no java
   exception was attached (ADVICE r10 item 2).
3. ``capture_checkpoints`` refuses nested/concurrent activation instead
   of corrupting the process-global patch (ADVICE r10 item 3).
"""

import pytest

from oic_options_chains_spark.sources.registry import table_row_count

SF_DIR = "/root/testdata/sf0.001"


def _plain_count() -> int:
    return table_row_count(SF_DIR, "region")


class TestRowCountUris:
    def test_plain_path(self):
        assert _plain_count() == 5

    def test_file_double_slash(self):
        assert table_row_count(f"file://{SF_DIR}", "region") == _plain_count()

    def test_file_single_slash_spark_canonical(self):
        # Spark renders local URIs as file:/path — no authority slashes
        assert table_row_count(f"file:{SF_DIR}", "region") == _plain_count()

    def test_file_scheme_uppercase(self):
        assert table_row_count(f"FILE://{SF_DIR}", "region") == _plain_count()

    def test_file_triple_slash(self):
        assert table_row_count(f"file://{SF_DIR}", "lineitem") == table_row_count(
            SF_DIR, "lineitem"
        )


class _JavaExc:
    """A java-exception stand-in whose chain never exposes a SQLState."""

    def getSQLState(self):  # noqa: N802 — java naming
        raise RuntimeError("not a SQLException")

    def getCause(self):  # noqa: N802
        return None

    def getNextException(self):  # noqa: N802
        return None


class _Py4jLike(Exception):
    def __init__(self, msg, java_exception):
        super().__init__(msg)
        self.java_exception = java_exception


class TestSqlStatesFallback:
    def test_chain_without_state_falls_back_to_message(self):
        from oic_options_chains_spark.sources.jdbc import _sql_states

        exc = _Py4jLike(
            "ERROR 23505: duplicate key value in a unique index", _JavaExc()
        )
        assert "23505" in _sql_states(exc)

    def test_chain_with_state_is_authoritative(self):
        from oic_options_chains_spark.sources.jdbc import _sql_states

        class _Stateful(_JavaExc):
            def getSQLState(self):  # noqa: N802
                return "40001"

        # message mentions another retryable state; the walked state wins
        # and the message scan must NOT widen it
        exc = _Py4jLike("text echoing 23505 from data", _Stateful())
        assert _sql_states(exc) == {"40001"}

    def test_no_java_exception_still_scans_message(self):
        from oic_options_chains_spark.sources.jdbc import _sql_states

        exc = Exception("deadlock detected, SQLSTATE 40001")
        assert "40001" in _sql_states(exc)


class TestCaptureCheckpointsGuard:
    def test_nested_capture_raises(self, spark):
        from oic_options_chains_spark import lineage

        with lineage.capture_checkpoints():
            with pytest.raises(RuntimeError, match="already active"):
                with lineage.capture_checkpoints():
                    pass  # pragma: no cover — must not be reached

    def test_guard_releases_after_exit(self, spark):
        from oic_options_chains_spark import lineage

        with lineage.capture_checkpoints() as stages_a:
            spark.range(3).localCheckpoint(eager=True)
        with lineage.capture_checkpoints() as stages_b:
            spark.range(4).localCheckpoint(eager=True)
        assert len(stages_a) == 1 and len(stages_b) == 1

    def test_guard_releases_after_error(self, spark):
        from oic_options_chains_spark import lineage

        with pytest.raises(ValueError, match="boom"):
            with lineage.capture_checkpoints():
                raise ValueError("boom")
        with lineage.capture_checkpoints() as stages:
            spark.range(2).localCheckpoint(eager=True)
        assert len(stages) == 1
