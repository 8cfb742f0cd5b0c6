from oic_options_chains_spark.sources.registry import load_table, load_tables

__all__ = ["load_table", "load_tables"]
