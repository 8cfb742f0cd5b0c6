"""Relational-to-corpus linearization: render structured rows as
deterministic training TEXT — the bridge step that turns warehouse
tables into LLM corpus documents (table-QA / structured-pretraining
pipelines serialize exactly like this before tokenization and packing).

Determinism rules (the whole point — the rendered string must hash
identically on any engine):
- numbers enter the text as BIGINTs or via the repo's
  decimal(18,2)->varchar idiom, never as raw doubles (double->string
  formatting is engine-specific);
- dates render through CAST(ts AS DATE) -> 'YYYY-MM-DD';
- detail rows are ordered by their line number inside ONE
  aggregation (array_sort over (linenumber, piece) structs), so the
  serialization is partition-independent.

Scale shape: one lineitem aggregation keyed on the order (map-side
combine on the piece structs), one orderkey-keyed join of two
fact-sized relations (co-partitioned sort-merge at scale), one
broadcast of the customer dimension. The text column is emitted once;
token counts ride the same projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linearize_orders(
    orders: DataFrame, customer: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """(doc_key, text, n_items, n_tokens): one corpus document per
    order, rendering customer, header fields, and line items in
    line-number order."""
    piece = F.concat(
        F.lit("item "),
        F.col("l_linenumber").cast("string"),
        F.lit(" part "),
        F.col("l_partkey").cast("string"),
        F.lit(" qty "),
        F.col("l_quantity").cast("bigint").cast("string"),
    )
    items = lineitem.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("l_linenumber"),
                            F.col("l_partkey"),
                            F.col("l_quantity").cast("bigint").alias("q"),
                            piece.alias("p"),
                        )
                    )
                ),
                lambda x: x["p"],
            ),
            "; ",
        ).alias("__items"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )
    txt = F.concat(
        F.lit("order "),
        F.col("o_orderkey").cast("string"),
        F.lit(" by "),
        F.col("c_name"),
        F.lit(" segment "),
        F.col("c_mktsegment"),
        F.lit(" on "),
        F.col("o_orderdate").cast("date").cast("string"),
        F.lit(" status "),
        F.col("o_orderstatus"),
        F.lit(" priority "),
        F.col("o_orderpriority"),
        F.lit(" total "),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.lit(" items "),
        F.coalesce(F.col("n_items"), F.lit(0)).cast("string"),
        F.lit(": "),
        F.coalesce(F.col("__items"), F.lit("none")),
    )
    return (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(items, orders["o_orderkey"] == items["l_orderkey"], "left")
        .select(
            F.col("o_orderkey").alias("doc_key"),
            txt.alias("text"),
            F.coalesce(F.col("n_items"), F.lit(0)).cast("bigint").alias("n_items"),
            F.size(F.split(txt, " ")).cast("bigint").alias("n_tokens"),
        )
    )
