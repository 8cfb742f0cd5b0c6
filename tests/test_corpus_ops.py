"""Unit tests for the corpus-preparation operators: chunking,
decontamination, repetition gates, BM25 weighting, and the deterministic
global shuffle (oracle parity for the registered queries lives in
test_oracle_parity.py — these cover the operator semantics directly on
crafted inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.chunking import chunk_documents
from oic_options_chains_spark.operators.decontam import contamination_counts
from oic_options_chains_spark.operators.ranking import bm25_components
from oic_options_chains_spark.operators.repetition import repetition_metrics
from oic_options_chains_spark.operators.sampling import global_shuffle


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunks_cover_document_without_gaps(spark):
    words = " ".join(f"w{i}" for i in range(150))
    out = chunk_documents(_docs(spark, [words]), window=64, overlap=16)
    rows = sorted(out.collect(), key=lambda r: r.chunk_id)
    # starts advance by window-overlap; the tail lives in the last chunk
    # (no redundant chunk fully contained in its predecessor)
    assert [r.start_token for r in rows] == [0, 48, 96]
    assert [r.n_chunk_tokens for r in rows] == [64, 64, 54]
    # stitching the non-overlap prefix of each chunk plus the full last
    # chunk rebuilds the document exactly
    stitched = []
    for r in rows[:-1]:
        stitched.extend(r.chunk_text.split(" ")[: 64 - 16])
    stitched.extend(rows[-1].chunk_text.split(" "))
    assert stitched == words.split(" ")


def test_chunk_short_doc_is_single_chunk(spark):
    out = chunk_documents(_docs(spark, ["only three words"]), window=64, overlap=16)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "only three words"
    assert rows[0].n_chunk_tokens == 3


def test_contamination_flags_shared_trigrams(spark):
    corpus = _docs(
        spark,
        [
            "alpha beta gamma delta epsilon",  # contains benchmark trigram
            "one two three four five",  # disjoint
        ],
    )
    bench = spark.createDataFrame(
        [(100, "x alpha beta gamma y")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in contamination_counts(corpus, bench).collect()
    }
    assert got[0] == (1, True)  # 'alpha beta gamma' shared
    assert got[1] == (0, False)


def test_repetition_metrics_flag_degenerate_docs(spark):
    df = _docs(
        spark,
        [
            "spam spam spam spam",  # top token = 4/4, all bigrams equal
            "a b c d",  # no repetition
        ],
    ).select("doc_id", *[v.alias(k) for k, v in repetition_metrics(F.col("text")).items()])
    got = {r.doc_id: r for r in df.collect()}
    assert got[0].top_token_bp == 10000
    assert got[0].dup_bigram_bp == 6666  # 3 bigrams, 1 distinct -> floor(2/3)
    assert got[1].top_token_bp == 2500
    assert got[1].dup_bigram_bp == 0


def test_bm25_factors_are_monotone(spark):
    df = _docs(
        spark,
        [
            "common common common rare",
            "common filler words here",
            "common unrelated text body",
        ],
    )
    out = bm25_components(df)
    rows = {(r.doc_id, r.term): r for r in out.collect()}
    # idf falls with document frequency: 'rare' (df=1) > 'common' (df=3)
    assert (
        rows[(0, "rare")].idf_rational_e6 > rows[(0, "common")].idf_rational_e6
    )
    # saturated tf grows with tf but sub-linearly (tf=3 < 3x tf=1 weight)
    same_len_doc = rows[(0, "common")]
    one_hit = rows[(2, "common")]
    assert same_len_doc.tf_sat_e6 > one_hit.tf_sat_e6
    assert same_len_doc.tf_sat_e6 < 3 * one_hit.tf_sat_e6


def test_pack_offsets_form_contiguous_streams(spark):
    from oic_options_chains_spark.operators.chunking import pack_stream_offsets

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 90 + 10).alias("n_tokens")
    )
    rows = pack_stream_offsets(df, n_tokens_col="n_tokens", context=256).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.stream_start)
        # each doc starts exactly where the previous one ended
        pos = 0
        for r in docs:
            assert r.stream_start == pos
            assert r.seq_index == pos // 256
            assert r.seq_offset == pos % 256
            pos += r.n_tokens


def test_quantize_values_within_int8_range(spark, sf_dir):
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings")
    xs = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    mx = F.array_max(F.transform(xs, F.abs))
    q = F.transform(xs, lambda v: F.floor(F.lit(127.0) * v / mx).cast("int"))
    row = e.select(
        F.min(F.array_min(q)).alias("lo"), F.max(F.array_max(q)).alias("hi")
    ).collect()[0]
    assert -128 <= row.lo <= row.hi <= 127


def test_mixture_sample_hits_quotas_and_excludes(spark):
    from oic_options_chains_spark.operators.sampling import mixture_sample

    rows = []
    sizes = {"a": 100, "b": 40, "c": 500, "x": 30}
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(df, "source", "doc_id", {"a": 2, "b": 1, "c": 2})
    got = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # binding source is 'b': T = min(100*5//2, 40*5//1, 500*5//2) = 200
    # quotas: a=2*200//5=80, b=40, c=80; 'x' excluded entirely
    assert got == {"a": 80, "b": 40, "c": 80}
    # determinism under repartitioning
    out2 = mixture_sample(
        df.repartition(7), "source", "doc_id", {"a": 2, "b": 1, "c": 2}
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )


def test_global_shuffle_is_deterministic_and_dense(spark):
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    a = global_shuffle(df, "doc_id", n_shards=8)
    b = global_shuffle(df.repartition(13), "doc_id", n_shards=8)
    ra = {r.doc_id: (r.shard, r.position) for r in a.collect()}
    rb = {r.doc_id: (r.shard, r.position) for r in b.collect()}
    assert ra == rb  # partitioning-independent
    # positions are dense 1..n within every shard
    by_shard: dict[int, list[int]] = {}
    for shard, pos in ra.values():
        by_shard.setdefault(shard, []).append(pos)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    assert len(by_shard) == 8


def test_winnowing_guarantees_shared_fingerprint_for_shared_runs(spark):
    from oic_options_chains_spark.operators.minhash import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    df = _docs(
        spark,
        [
            f"intro words here {shared} closing remarks",
            f"totally different opening {shared} and another tail",
            "no overlap with anything else at all whatsoever",
        ],
    )
    fps = winnow_fingerprints(df, k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    # the MOSS guarantee: a shared (w+k-1)-token run -> >=1 shared fp
    assert by_doc[0] & by_doc[1]
    # token-disjoint docs share nothing (md5 of distinct shingles)
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])
    # winnowing is a subset of full shingle hashes, strictly sparser
    from oic_options_chains_spark.operators.minhash import doc_shingles

    n_shingles = doc_shingles(df, "doc_id", "text").count()
    assert len(fps) < n_shingles


def test_cluster_conf_scales_with_cluster_shape():
    from oic_options_chains_spark.session import cluster_conf

    small = cluster_conf(total_cores=800, input_tb=1.0)
    big = cluster_conf(total_cores=8000, input_tb=100.0)
    # shuffle partitions track cores (3x) and never let the largest
    # stage's partitions exceed ~512 MB of input each
    assert int(small["spark.sql.shuffle.partitions"]) >= 3 * 800
    assert int(big["spark.sql.shuffle.partitions"]) >= 3 * 8000
    assert int(big["spark.sql.shuffle.partitions"]) >= 100 * 1024 * 1024 // 512
    # scan splits and broadcast threshold are fixed, memory-derived caps
    assert int(big["spark.sql.files.maxPartitionBytes"]) == 256 * 1024 * 1024
    assert int(big["spark.sql.autoBroadcastJoinThreshold"]) == 64 * 1024 * 1024


def test_raw_zone_retention_spares_unloaded_days(tmp_path):
    import os

    from oic_options_chains_spark.sources.warehouse import expire_raw_days

    base = str(tmp_path / "raw")
    for d in ("2024-01-01", "2024-01-05", "2024-02-01", "not-a-date"):
        os.makedirs(os.path.join(base, d))
        open(os.path.join(base, d, "f.json"), "w").write("{}")

    expired = expire_raw_days(
        base, keep_days=10, today="2024-02-05",
        loaded_dates={"2024-01-01"},  # 01-05 is old but never loaded
    )
    assert expired == ["2024-01-01"]
    left = sorted(os.listdir(base))
    assert left == ["2024-01-05", "2024-02-01", "not-a-date"]

    # without the loaded-set guard, all sufficiently old dated dirs go
    expired2 = expire_raw_days(base, keep_days=10, today="2024-02-05")
    assert expired2 == ["2024-01-05"]


def test_sql_views_drive_the_engine(spark, sf_dir):
    from oic_options_chains_spark.sources.registry import TABLES, register_views

    register_views(spark, sf_dir)
    for t in TABLES:
        assert spark.catalog.tableExists(t)
    got = spark.sql(
        "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang"
    ).collect()
    assert sum(r.n for r in got) == spark.table("documents").count()
    # pushdown still reaches the scan through the view
    plan = (
        spark.sql("SELECT doc_id FROM documents WHERE doc_id = 7")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]" in plan


def test_mixture_sample_empty_weighted_source_forces_empty_output(spark):
    from oic_options_chains_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "a") for i in range(20)] + [(100 + i, "b") for i in range(10)],
        "doc_id long, source string",
    )
    # 'ghost' is weighted but has zero rows: it cannot supply its share,
    # so the joint total T is 0 and the mixture is empty (the invariant
    # "every weighted source can supply its share" holds vacuously).
    out = mixture_sample(df, "source", "doc_id", {"a": 1, "b": 1, "ghost": 1})
    assert out.count() == 0
    # dropping the ghost restores the normal quotas
    ok = mixture_sample(df, "source", "doc_id", {"a": 1, "b": 1})
    got = {
        r.source: r.n
        for r in ok.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {"a": 10, "b": 10}


def test_chunk_dedup_keeper_survives_100k_token_documents(spark, tmp_path):
    """The keeper packs (doc_id, start_token) as doc_id*2^32 + start: a
    document with >=100k tokens must not let start_token overflow into
    the doc_id ordering (the old decimal 1e5 shift did exactly that)."""
    from oic_options_chains_spark.queries import QUERIES

    big = " ".join(["x"] * 100_016)  # chunks at starts 0, 48, ..., 100000
    small = " ".join(["x"] * 64)     # identical 64-token chunk text
    spark.createDataFrame(
        [(1, big, "src0"), (2, small, "src0")],
        "doc_id long, text string, source string",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["q_chunk_dedup"](spark, str(tmp_path))
    full = out.filter(F.col("copies") > 1).collect()
    assert len(full) == 1  # every full 64-token chunk has identical text
    keeper = full[0].keeper
    # keeper must decode to the smallest (doc_id, start) pair: doc 1, start 0
    assert (keeper // 4294967296, keeper % 4294967296) == (1, 0)


def test_pack_loss_masks_cover_exactly_and_clip(spark):
    from oic_options_chains_spark.operators.chunking import (
        pack_loss_masks,
        pack_stream_offsets,
    )

    df = spark.createDataFrame(
        [(i, 100) for i in range(1, 9)], "doc_id bigint, n_tokens bigint"
    )
    packed = pack_stream_offsets(df, key="doc_id", context=64, n_shards=2)
    masks = pack_loss_masks(packed, context=64).collect()
    # spans clip to the sequence and cover each document's tokens exactly
    per_doc = {}
    for r in masks:
        assert 0 <= r["begin_in_seq"] < r["end_in_seq"] <= 64
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + (
            r["end_in_seq"] - r["begin_in_seq"]
        )
    assert per_doc == {i: 100 for i in range(1, 9)}
    # within a (shard, seq), spans tile without overlap
    by_seq = {}
    for r in masks:
        by_seq.setdefault((r["shard"], r["seq_index"]), []).append(
            (r["begin_in_seq"], r["end_in_seq"])
        )
    for spans in by_seq.values():
        spans.sort()
        for (b1, e1), (b2, e2) in zip(spans, spans[1:]):
            assert e1 == b2, spans


def test_pack_loss_masks_on_non_default_key(spark):
    """ADVICE r7 (chunking.py): masks over a pack keyed on something
    other than doc_id (e.g. the episode pack) must work via id_col."""
    from oic_options_chains_spark.operators.chunking import (
        pack_loss_masks,
        pack_stream_offsets,
    )

    df = spark.createDataFrame(
        [(f"ep{i}", 100) for i in range(1, 5)],
        "episode_key string, n_tokens bigint",
    )
    packed = pack_stream_offsets(df, key="episode_key", context=64, n_shards=2)
    masks = pack_loss_masks(packed, context=64, id_col="episode_key").collect()
    per_ep = {}
    for r in masks:
        assert 0 <= r["begin_in_seq"] < r["end_in_seq"] <= 64
        per_ep[r["episode_key"]] = per_ep.get(r["episode_key"], 0) + (
            r["end_in_seq"] - r["begin_in_seq"]
        )
    assert per_ep == {f"ep{i}": 100 for i in range(1, 5)}


def test_span_corruption_is_deterministic_merged_and_clipped(spark):
    from oic_options_chains_spark.operators.chunking import (
        span_corruption_manifest,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(120))) for i in range(1, 6)],
        "doc_id bigint, text string",
    )
    a = sorted(map(tuple, span_corruption_manifest(docs).collect()))
    b = sorted(map(tuple, span_corruption_manifest(docs).collect()))
    assert a == b and len(a) > 0  # content-hash draws replay exactly
    for doc_id, span_idx, start, length, n_tokens in a:
        assert 0 <= start and start + length <= n_tokens and length >= 1
    # spans within a doc are disjoint, non-adjacent-mergeable, ordered
    by_doc = {}
    for r in a:
        by_doc.setdefault(r[0], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r[1])
        for (_, i1, s1, l1, _), (_, i2, s2, _, _) in zip(rows, rows[1:]):
            assert i2 == i1 + 1
            assert s2 > s1 + l1  # merged spans never touch


def test_pack_sub_buckets_knob_is_output_identical(spark):
    from oic_options_chains_spark.operators.chunking import (
        pack_grouped_stream_offsets,
        pack_stream_offsets,
    )

    df = spark.createDataFrame(
        [(i, 17 + (i * 13) % 90) for i in range(1, 300)],
        "doc_id bigint, n_tokens bigint",
    )
    serial = sorted(map(tuple, pack_stream_offsets(df, sub_buckets=1).collect()))
    dist = sorted(
        map(tuple, pack_stream_offsets(df, sub_buckets=256).collect())
    )
    coarse = sorted(
        map(tuple, pack_stream_offsets(df, sub_buckets=16).collect())
    )
    assert serial == dist == coarse

    segs = spark.createDataFrame(
        [(i, j, 10 + (i + j) % 7) for i in range(1, 80) for j in range(3)],
        "doc_id bigint, seg_idx int, n_tokens bigint",
    )
    g_serial = sorted(
        map(tuple, pack_grouped_stream_offsets(segs, sub_buckets=1).collect())
    )
    g_dist = sorted(
        map(tuple, pack_grouped_stream_offsets(segs, sub_buckets=64).collect())
    )
    assert g_serial == g_dist


def test_composed_sequences_are_exactly_context_except_tails(spark):
    from oic_options_chains_spark.operators.chunking import (
        compose_packed_sequences,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(37))) for i in range(1, 40)],
        "doc_id bigint, text string",
    )
    rows = compose_packed_sequences(docs, context=64, n_shards=4).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
        assert len(r["seq_text"].split(" ")) == r["n_tokens"]
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["seq_index"])
        # every sequence but the shard tail is exactly `context` tokens
        for r in shard_rows[:-1]:
            assert r["n_tokens"] == 64, r
        assert 1 <= shard_rows[-1]["n_tokens"] <= 64
        # sequence indices are contiguous from 0
        assert [r["seq_index"] for r in shard_rows] == list(
            range(len(shard_rows))
        )
