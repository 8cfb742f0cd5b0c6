"""Token-window document chunking for training-data pipelines.

Splitting long documents into fixed-size token windows (with overlap for
context continuity) is the step between a cleaned corpus and a training
shard: every downstream tokenizer/packer consumes chunks, not documents.

Design: tokens -> arithmetic start offsets -> ``F.slice`` per offset ->
``posexplode``. Everything is a built-in array expression (whole-stage
codegen); chunking a document is embarrassingly row-local, so the
operator adds NO shuffle — a chunked scan is still a scan. At 100 TB the
only knob that matters is output row width: we emit the chunk text plus
its token span so a downstream packer can regroup without re-tokenizing.

Determinism: chunk boundaries are pure integer arithmetic on the token
array; no RNG, no partition sensitivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunk_starts(n_tokens: Column, window: int, overlap: int) -> Column:
    """0-based start offsets: 0, step, 2*step, ... where step =
    window - overlap. A start is emitted only while it contributes NEW
    tokens (start < n_tokens - overlap): the document tail is always
    covered — possibly by a short final chunk — but never by a redundant
    chunk whose content lies entirely inside the previous one. This
    also guarantees every chunk except the last is exactly ``window``
    tokens."""
    step = window - overlap
    lim = F.greatest(n_tokens.cast("bigint") - overlap, F.lit(1))
    last = F.greatest(
        F.lit(0), F.floor((lim - 1) / step) * step
    ).cast("int")
    return F.sequence(F.lit(0), last, F.lit(step))


def pack_stream_offsets(
    df: DataFrame,
    key: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    context: int = 256,
    n_shards: int = 8,
    sub_buckets: int = 1,
) -> DataFrame:
    """Concat-then-split sequence packing: documents are laid out in a
    deterministic pseudo-random stream (md5 order) and the stream is cut
    into fixed ``context``-token training sequences. Each document gets
    its stream offset, the sequence index its first token lands in, and
    the offset inside that sequence — everything a packer needs to emit
    fixed-length rows without re-tokenizing.

    Scale: a single global cumsum would serialize on one task, so the
    stream is sharded first (content-hash) and each shard packs
    independently — one exchange, then per-shard window cumsum. At
    scale ``n_shards`` IS the parallelism knob: a 100 TB packer writes
    tens of thousands of shard files, so per-shard windows stay
    task-sized. When the deployment instead wants FEW giant streams,
    ``sub_buckets > 1`` switches the cumsum to an order-preserving
    DISTRIBUTED prefix sum (``_distributed_pack_cumsum``): md5-prefix
    sub-buckets cumsum locally and a tiny per-bucket offsets relation
    broadcasts back — OUTPUT-IDENTICAL to the serial form (the knob
    changes the plan, never a value), parallelism n_shards*sub_buckets.
    """
    from oic_options_chains_spark.operators.sampling import hash_bucket

    k = F.col(key)
    toks = F.col(n_tokens_col).cast("bigint")
    base = df.withColumn("shard", hash_bucket(k, n_shards).cast("int")).withColumn(
        "__ok", F.md5(k.cast("string"))
    )
    packed = _pack_cumsum(
        base, order_cols=[F.col("__ok").asc(), k.asc()], toks=toks,
        sub_buckets=sub_buckets,
    )
    return packed.select(
        key,
        "shard",
        toks.alias("n_tokens"),
        (F.col("__cum") - toks).alias("stream_start"),
        F.floor((F.col("__cum") - toks) / context).cast("bigint").alias("seq_index"),
        ((F.col("__cum") - toks) % context).cast("bigint").alias("seq_offset"),
    )


def _pack_cumsum(base, order_cols, toks, sub_buckets: int = 1):
    """Running total in global shard order: per-shard window when
    sub_buckets == 1, order-preserving distributed prefix sum when > 1."""
    if sub_buckets <= 1:
        w = (
            Window.partitionBy("shard")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return base.withColumn("__cum", F.sum(toks).over(w))
    return _distributed_pack_cumsum(
        base, order_cols=order_cols, toks=toks, sub_buckets=sub_buckets
    )


def _distributed_pack_cumsum(base, order_cols, toks, sub_buckets: int = 256):
    """Order-preserving distributed prefix sum over (shard, __ok-ordered
    rows): within-(shard, sub-bucket) window cumsum + per-bucket offsets
    broadcast back. ``base`` must carry ``shard`` and ``__ok`` (the md5
    order key whose leading hex chars define the sub-buckets); returns
    ``base`` plus ``__cum`` (inclusive running total in global shard
    order). The hex prefix is order-consistent with the full md5 string
    ('0'-'9' < 'a'-'f' in ASCII), so bucket-major order IS stream order.

    Cost shape: the corpus exchanges ONCE on (shard, sub-bucket); the
    offsets relation is built by a pruned re-pass whose exchange is
    post-partial-aggregate (bucket-count-sized), then broadcasts back.
    Worth it when shards are giant streams; at bench scale the extra
    stages are pure overhead, hence the sub_buckets=1 default upstream."""
    # order-preserving bucket id: SCALE the 0..255 prefix down (integer
    # division keeps monotonicity; a modulo would interleave key ranges
    # across buckets and break the global stream order)
    sub = F.floor(
        F.conv(F.substring(F.col("__ok"), 1, 2), 16, 10).cast("int")
        * sub_buckets
        / 256
    ).cast("int")
    b = base.withColumn("__sub", sub)
    w_local = (
        Window.partitionBy("shard", "__sub")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("__lcum", F.sum(toks).over(w_local))
    totals = local.groupBy("shard", "__sub").agg(
        F.sum(toks).alias("__btot")
    )
    w_off = (
        Window.partitionBy("shard")
        .orderBy("__sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "shard",
        "__sub",
        F.coalesce(F.sum("__btot").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), ["shard", "__sub"])
        .withColumn("__cum", F.col("__lcum") + F.col("__off"))
        .drop("__lcum", "__off", "__sub")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    window: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Output: id_cols + (chunk_id, start_token, n_chunk_tokens, chunk_text).
    ``chunk_id`` is the 0-based window index within the document;
    consecutive chunks share ``overlap`` tokens.
    """
    assert 0 <= overlap < window, "overlap must be in [0, window)"
    toks = F.split(F.lower(F.col(text_col)), " ")
    starts = chunk_starts(F.size(toks), window, overlap)
    chunked = df.select(
        *id_cols,
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_id", "start_token"),
    )
    piece = F.slice(F.col("__toks"), F.col("start_token") + 1, window)
    return chunked.select(
        *id_cols,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start_token").cast("int").alias("start_token"),
        F.size(piece).cast("int").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def sequence_boundaries(
    df: DataFrame,
    key: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    context: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """(shard, seq_index, id, seg_start, seg_end): every document
    segment inside every packed training sequence — the attention-reset
    / loss-mask manifest a trainer consumes alongside the packed tokens
    (cross-document attention is masked exactly at these boundaries).

    Built on ``pack_stream_offsets``: a document spanning stream range
    [s, s+n) intersects sequences floor(s/ctx) .. floor((s+n-1)/ctx);
    the explode emits one row per (doc, sequence) intersection with the
    segment clipped to that sequence's window. Row count is bounded by
    n_docs + n_sequences (each doc adds at most one more row than the
    sequences it fully fills), so the manifest is corpus-proportional,
    never quadratic. Same sharded layout as the packer — boundaries
    never cross shards either."""
    packed = pack_stream_offsets(df, key, n_tokens_col, context, n_shards)
    first_seq = F.col("seq_index")
    last_seq = F.floor(
        (F.col("stream_start") + F.col("n_tokens") - 1) / context
    ).cast("bigint")
    exploded = packed.filter(F.col("n_tokens") > 0).select(
        F.col(key),
        "shard",
        "stream_start",
        "n_tokens",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq"),
    )
    seq_lo = F.col("seq") * context
    seq_hi = (F.col("seq") + 1) * context
    return exploded.select(
        F.col("shard"),
        F.col("seq").alias("seq_index"),
        F.col(key),
        (F.greatest(F.col("stream_start"), seq_lo) - seq_lo)
        .cast("bigint")
        .alias("seg_start"),
        (
            F.least(F.col("stream_start") + F.col("n_tokens"), seq_hi) - seq_lo
        )
        .cast("bigint")
        .alias("seg_end"),
    )


def interleave_media_segments(
    df: DataFrame,
    tokens_per_seg: int = 50,
    media_mod: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Multimodal training-record assembly: split each document into
    ``tokens_per_seg``-token text segments and interleave a media
    placeholder between consecutive segments — the LLaVA-style
    text/image interleave a vision-language pipeline feeds the packer,
    with the media reference resolved later against the media manifest
    (here a deterministic ``media:<(id·31+slot) % media_mod>`` key).

    (id, seg_idx, kind, content, n_tokens): text segments at even
    seg_idx, media placeholders (n_tokens=1, the sentinel token) at odd;
    no placeholder after the final segment.

    Scale shape: one ``transform`` + ``flatten`` + ``posexplode`` —
    entirely row-local, shuffle-free (the output feeds pack_sequences'
    shard window, which owns the only exchange)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(toks)
    nsegs = ((n + (tokens_per_seg - 1)) / tokens_per_seg).cast("int")
    did = F.col(id_col)

    def per_seg(i):
        text_s = F.struct(
            (2 * i).cast("int").alias("seg_idx"),
            F.lit("text").alias("kind"),
            F.concat_ws(
                " ", F.slice(toks, i * tokens_per_seg + 1, tokens_per_seg)
            ).alias("content"),
            F.least(F.lit(tokens_per_seg), n - i * tokens_per_seg)
            .cast("bigint")
            .alias("n_tokens"),
        )
        img_s = F.struct(
            (2 * i + 1).cast("int").alias("seg_idx"),
            F.lit("image").alias("kind"),
            F.concat(
                F.lit("media:"), ((did * 31 + i) % media_mod).cast("string")
            ).alias("content"),
            F.lit(1).cast("bigint").alias("n_tokens"),
        )
        return F.array(text_s, img_s)

    segs = F.flatten(F.transform(F.sequence(F.lit(0), nsegs - 1), per_seg))
    # every segment emitted a trailing placeholder; drop the one after
    # the final text segment (interleave, not append) — nsegs rides
    # along the explode so the trim is a row-local filter, no join
    return (
        df.select(did, nsegs.alias("__nsegs"), F.explode(segs).alias("s"))
        .filter(F.col("s.seg_idx") != 2 * F.col("__nsegs") - 1)
        .select(id_col, "s.seg_idx", "s.kind", "s.content", "s.n_tokens")
    )


def pack_grouped_stream_offsets(
    df: DataFrame,
    group_col: str = "doc_id",
    seq_col: str = "seg_idx",
    n_tokens_col: str = "n_tokens",
    context: int = 256,
    n_shards: int = 8,
    sub_buckets: int = 1,
) -> DataFrame:
    """pack_stream_offsets for SEGMENTED records: the stream is laid out
    in md5 order of the GROUP (document) with each group's segments kept
    contiguous and in ``seq_col`` order — the invariant a multimodal
    record needs (a media placeholder must land next to its text
    segment, never shuffled away from it). Same cumsum shape and
    ``sub_buckets`` knob as the flat packer (md5-prefix sub-buckets key
    on the GROUP, so a group's segments stay in one bucket and
    contiguity survives the split)."""
    from oic_options_chains_spark.operators.sampling import hash_bucket

    g = F.col(group_col)
    toks = F.col(n_tokens_col).cast("bigint")
    base = df.withColumn(
        "shard", hash_bucket(g, n_shards).cast("int")
    ).withColumn("__ok", F.md5(g.cast("string")))
    packed = _pack_cumsum(
        base,
        order_cols=[F.col("__ok").asc(), g.asc(), F.col(seq_col).asc()],
        toks=toks,
        sub_buckets=sub_buckets,
    )
    return (
        packed.drop("__ok")
        .withColumn("stream_start", F.col("__cum") - toks)
        .drop("__cum")
        .withColumn(
            "seq_index",
            F.floor(F.col("stream_start") / context).cast("bigint"),
        )
        .withColumn("seq_offset", (F.col("stream_start") % context).cast("bigint"))
        # canonical column order regardless of cumsum path (the
        # distributed join moves its keys to the front)
        .select(
            *df.columns, "shard", "stream_start", "seq_index", "seq_offset"
        )
    )


def pack_loss_masks(
    packed: DataFrame, context: int = 256, id_col: str = "doc_id"
) -> DataFrame:
    """Per-sequence document-span manifest over a packed stream: for
    every training sequence a document overlaps, the token range it
    occupies — (shard, seq_index, <id_col>, begin_in_seq, end_in_seq).
    This is what the trainer consumes to build cross-document attention
    / loss masks for concat-then-split packing: sequence boundaries cut
    documents, and the mask has to know where each fragment lives.

    Input is ``pack_stream_offsets`` output (or the grouped packer's —
    pass its key, e.g. ``id_col="episode_key"``, when the pack is keyed
    on something other than doc_id); the explode is row-local over the
    (usually 1-2) sequences a document touches — ceil(n_tokens /
    context) + 1 rows max — so the manifest adds NO exchange beyond the
    packer's own cumsum."""
    st = F.col("stream_start").cast("bigint")
    n = F.col("n_tokens").cast("bigint")
    ctx = F.lit(context).cast("bigint")
    first = F.floor(st / ctx).cast("bigint")
    last = F.floor((st + n - 1) / ctx).cast("bigint")
    rows = packed.filter(n > 0).select(
        id_col,
        F.col("shard"),
        st.alias("__st"),
        n.alias("__n"),
        F.explode(F.sequence(first, last)).alias("seq_index"),
    )
    q = F.col("seq_index")
    return rows.select(
        F.col("shard"),
        q.cast("bigint").alias("seq_index"),
        id_col,
        (F.greatest(F.col("__st"), q * ctx) - q * ctx)
        .cast("bigint")
        .alias("begin_in_seq"),
        (F.least(F.col("__st") + F.col("__n"), (q + 1) * ctx) - q * ctx)
        .cast("bigint")
        .alias("end_in_seq"),
    )


def span_corruption_manifest(
    df: DataFrame,
    rate_denom: int = 20,
    max_span: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic T5/UL2-style span-corruption manifest: for each
    document, the token spans a denoising objective would mask — chosen
    by content hash, not a seeded RNG, so the same document gets the
    same spans on any engine, any partitioning, any rerun (the
    reproducibility property a training pipeline actually needs from
    its preprocessing).

    A token position i STARTS a span iff md5(doc_id:i) % rate_denom ==
    0 (expected start rate 1/rate_denom); the span's length is
    1 + md5(doc_id:i:L) % max_span. Overlapping/adjacent spans merge
    (the span_dedup gaps-and-islands pass), and every span clips to the
    document. Output: (doc_id, span_idx, start, length, n_tokens) —
    span_idx in start order, 0-based.

    Scale shape: start selection and length draws are array-side over
    the token count (no per-token explode of text), the merge windows
    partition by document. One doc-keyed exchange total."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(toks)
    did = F.col(id_col).cast("string")

    def h(i, salt):
        key = F.concat_ws(":", did, i.cast("string"), F.lit(salt))
        return F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("bigint")

    starts = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda i: h(i, "s") % rate_denom == 0,
    )
    spans = df.select(
        F.col(id_col),
        n.alias("__n"),
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    i.cast("int").alias("start"),
                    F.least(
                        i + 1 + (h(i, "L") % max_span).cast("int"), n
                    )
                    .cast("int")
                    .alias("end"),
                ),
            )
        ).alias("sp"),
    ).select(F.col(id_col), "__n", "sp.start", "sp.end")

    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = spans.withColumn(
        "__prev_max", F.max("end").over(w_prev)
    ).withColumn(
        "__island",
        F.sum(
            F.when(
                F.col("__prev_max").isNull()
                | (F.col("start") > F.col("__prev_max")),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    merged = islands.groupBy(id_col, "__island").agg(
        F.min("start").alias("start"),
        (F.max("end") - F.min("start")).alias("length"),
        F.first("__n").alias("__n"),
    )
    w_idx = Window.partitionBy(id_col).orderBy("start")
    return merged.select(
        F.col(id_col),
        (F.row_number().over(w_idx) - 1).cast("int").alias("span_idx"),
        F.col("start").cast("bigint").alias("start"),
        F.col("length").cast("bigint").alias("length"),
        F.col("__n").cast("bigint").alias("n_tokens"),
    )


def compose_packed_sequences(
    docs: DataFrame,
    context: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Emit the ACTUAL fixed-length training rows: pack the corpus
    stream, cut it into ``context``-token sequences, and assemble each
    sequence's text from the document fragments the mask manifest says
    it contains — the end-to-end proof that stream offsets, sequence
    cuts, and span clipping all agree (every interior sequence composes
    to exactly ``context`` tokens; only each shard's tail runs short).

    Output: (shard, seq_index, n_docs, n_tokens, seq_text), seq_text
    being the space-joined tokens in stream order.

    Scale shape: one pack cumsum, the row-local mask explode, a
    doc-keyed join back to the text (fragment slicing is array-side on
    the token array), and ONE (shard, seq)-keyed aggregation whose
    groups are context-bounded — no group ever exceeds ``context``
    tokens, so assembly can never create a hot key."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    sized = docs.select(
        F.col(id_col), F.size(toks).cast("bigint").alias("n_tokens")
    )
    packed = pack_stream_offsets(
        sized, key=id_col, context=context, n_shards=n_shards
    )
    masks = pack_loss_masks(packed, context=context)
    # doc-local token range of each fragment: global position of the
    # fragment start minus the document's stream offset
    j = masks.join(
        packed.select(F.col(id_col), "stream_start"), id_col
    ).join(docs.select(F.col(id_col), F.col(text_col)), id_col)
    local_start = (
        F.col("seq_index") * context + F.col("begin_in_seq")
        - F.col("stream_start")
    )
    frag_len = F.col("end_in_seq") - F.col("begin_in_seq")
    frags = j.select(
        "shard",
        "seq_index",
        "begin_in_seq",
        F.array_join(
            F.slice(
                F.split(F.lower(F.col(text_col)), " "),
                (local_start + 1).cast("int"),
                frag_len.cast("int"),
            ),
            " ",
        ).alias("frag"),
        frag_len.alias("__n"),
    )
    return frags.groupBy("shard", "seq_index").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__n").cast("bigint").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("begin_in_seq", F.col("frag").alias("f")))
                ),
                lambda x: x["f"],
            ),
            " ",
        ).alias("seq_text"),
    )
