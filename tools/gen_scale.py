"""Deterministic local scale-up of the driver's sf0.1 tables.

The driver generates /root/testdata/sf{0.001,0.01,0.1}; scale-curve
evidence needs points ABOVE the bench SF to show each plan's cost
actually bends the way SCALING.md argues (sublinear pair counts for
LSH banding, linear scans for row-local ops). This produces sf0.5 and
sf1 under <repo>/.scale/ by replicating sf0.1 K times (K=5, 10) with:

- every key domain shifted per replica (custkey/orderkey/partkey/
  suppkey/doc_id/vec_id/event_id/user_id), so PK uniqueness and FK
  integrity survive replication — join fan-outs grow linearly, never
  quadratically, exactly as a larger TPC-H SF would behave;
- document text mutated per replica (replica token + word rotation),
  so shingle/minhash distributions keep the base corpus's self-
  similarity instead of manufacturing K-sized exact-dup clusters that
  would inflate LSH pair counts quadratically for data (not plan)
  reasons;
- embeddings perturbed per replica with a small deterministic offset,
  preserving norm/cluster structure while keeping vectors distinct;
- region/nation copied as-is (fixed dimensions at every TPC-H SF).

Schemas are preserved byte-for-byte via pyarrow (the us-timestamp
columns must not be rewritten to a different physical type, or Spark's
reader would see a different schema than the driver tables).

Layout: each table is written as a DIRECTORY ``<table>.parquet/`` of 32
equal part-files (Spark reads it transparently). The driver's tables are
single-file single-row-group parquet, which Spark cannot split — every
scan runs on ONE task, so a curve over those files measures serial CPU
growth, not plan behavior. A 100 TB deployment always has many files;
fixing the part count at 32 across every curve point keeps scan
parallelism constant, so the fitted slope isolates how the PLAN's cost
grows with data. sf0.1 is re-materialized here too (factor 1) so all
three curve points share the layout.

Usage: python tools/gen_scale.py [--out .scale] [--factors 1 5 10]
Idempotent: skips a table whose output already exists unless --force.
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key columns per table and the domain they index into; every column
# that references a domain shifts by replica * span(domain)
KEY_DOMAINS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_AS_IS = ("region", "nation")


def _domain_spans() -> dict[str, int]:
    spans: dict[str, int] = {}
    for table, cols in KEY_DOMAINS.items():
        t = pq.read_table(f"{SRC}/{table}.parquet", columns=list(cols))
        for col, domain in cols.items():
            hi = pc.max(t[col]).as_py() or 0
            spans[domain] = max(spans.get(domain, 0), int(hi) + 1)
    return spans


def _mutate_documents(tbl: pa.Table, replica: int) -> pa.Table:
    """Replica token + word rotation: same length distribution, same
    language stats, distinct shingles."""
    if replica == 0:
        return tbl
    texts = tbl["text"].to_pylist()
    out = []
    for i, s in enumerate(texts):
        if s is None:
            out.append(None)
            continue
        words = s.split(" ")
        k = (replica * 7 + i) % max(len(words), 1)
        out.append(f"r{replica} " + " ".join(words[k:] + words[:k]))
    idx = tbl.schema.get_field_index("text")
    return tbl.set_column(idx, tbl.schema.field(idx), pa.array(out, pa.string()))


def _mutate_embeddings(tbl: pa.Table, replica: int) -> pa.Table:
    if replica == 0:
        return tbl
    vecs = tbl["embedding"].to_pylist()
    out = []
    for i, v in enumerate(vecs):
        if v is None:
            out.append(None)
            continue
        out.append(
            [
                x + 0.01 * ((replica * 31 + i + j) % 7 - 3)
                for j, x in enumerate(v)
            ]
        )
    idx = tbl.schema.get_field_index("embedding")
    return tbl.set_column(
        idx, tbl.schema.field(idx), pa.array(out, tbl.schema.field(idx).type)
    )


def _replicate(table: str, factor: int, spans: dict[str, int]) -> pa.Table:
    base = pq.read_table(f"{SRC}/{table}.parquet")
    parts = []
    for r in range(factor):
        t = base
        for col, domain in KEY_DOMAINS.get(table, {}).items():
            if r:
                idx = t.schema.get_field_index(col)
                field = t.schema.field(idx)
                shifted = pc.cast(
                    pc.add(t[col], r * spans[domain]), field.type
                )
                t = t.set_column(idx, field, shifted)
        if table == "documents":
            t = _mutate_documents(t, r)
        elif table == "embeddings":
            t = _mutate_embeddings(t, r)
        parts.append(t)
    return pa.concat_tables(parts).combine_chunks()


def _write_parts(t: pa.Table, dst: str, n_files: int = 32) -> None:
    """Write as a directory of ~equal part-files (Spark-splittable)."""
    import shutil

    if os.path.isdir(dst):
        shutil.rmtree(dst)
    elif os.path.exists(dst):
        os.remove(dst)
    n = t.num_rows
    k = max(1, min(n_files, n))
    os.makedirs(dst, exist_ok=True)
    step = -(-n // k)
    for i in range(k):
        chunk = t.slice(i * step, step)
        if chunk.num_rows == 0:
            break
        pq.write_table(chunk, f"{dst}/part-{i:04d}.parquet")


def _zipf_ranks(rng, n_draws: int, n_ranks: int, s: float = 1.2):
    """Deterministic Zipf(s) rank draws in [0, n_ranks) via inverse-CDF
    over the exact finite distribution (numpy.random.zipf is unbounded
    and non-reproducible across versions for our purposes)."""
    import numpy as np

    w = 1.0 / np.power(np.arange(1, n_ranks + 1, dtype=np.float64), s)
    cdf = np.cumsum(w / w.sum())
    return np.searchsorted(cdf, rng.random_sample(n_draws), side="left")


def zipf_variant(
    out_dir: str, base_dir: str, s: float = 1.2, seed: int = 42
) -> None:
    """Heavy-tail stress twin of a scale dir: same schemas and row
    counts, but the skewable key/content distributions redrawn Zipf(s).

    - ``events.event_type`` redrawn Zipf over the existing type set (the
      hottest type carries ~half the rows — the hot-reducer-key shape
      ``q_salted_agg`` exists for) and ``user_id`` Zipf over the user
      domain (hot-entity windows/joins).
    - ``documents.text`` gets a Zipf-chosen shared TEMPLATE sentence
      prepended from a 20-template pool — head templates appear in a
      large fraction of documents, making the shingle frequency
      distribution heavy-tailed (the LSH band-key stress).
    - ``part.p_name`` redrawn Zipf from the base name vocabulary —
      popular names cover many records (the entity-resolution clique
      stress operators/linkage.py's distinct-name matching kills).

    Only the three stressed tables are rewritten; every other table is
    SYMLINKED to the base dir's copy so the twin is a complete fixture
    (bench_curve --zipf-point runs full registry queries against it,
    e.g. q_dedup_ensemble also loads embeddings). Deterministic: fixed
    seed, exact finite inverse-CDF."""
    import numpy as np

    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)

    ev = pq.read_table(f"{base_dir}/events.parquet")
    types = sorted(set(ev["event_type"].to_pylist()))
    n = ev.num_rows
    t_ranks = _zipf_ranks(rng, n, len(types), s)
    new_types = pa.array([types[r] for r in t_ranks], pa.string())
    n_users = int(pc.max(ev["user_id"]).as_py()) + 1
    u_field = ev.schema.field(ev.schema.get_field_index("user_id"))
    new_users = pc.cast(
        pa.array(_zipf_ranks(rng, n, n_users, s)), u_field.type
    )
    ev = ev.set_column(
        ev.schema.get_field_index("event_type"),
        ev.schema.field(ev.schema.get_field_index("event_type")),
        new_types,
    )
    ev = ev.set_column(ev.schema.get_field_index("user_id"), u_field, new_users)
    _write_parts(ev, f"{out_dir}/events.parquet")

    docs = pq.read_table(f"{base_dir}/documents.parquet")
    templates = [
        " ".join(f"tmpl{t}w{j}" for j in range(12)) for t in range(20)
    ]
    d_ranks = _zipf_ranks(rng, docs.num_rows, len(templates), s)
    texts = docs["text"].to_pylist()
    new_texts = [
        None if x is None else f"{templates[r]} {x}"
        for r, x in zip(d_ranks, texts)
    ]
    ti = docs.schema.get_field_index("text")
    docs = docs.set_column(
        ti, docs.schema.field(ti), pa.array(new_texts, pa.string())
    )
    _write_parts(docs, f"{out_dir}/documents.parquet")

    part = pq.read_table(f"{base_dir}/part.parquet")
    vocab = sorted(set(part["p_name"].to_pylist()))
    p_ranks = _zipf_ranks(rng, part.num_rows, len(vocab), s)
    ni = part.schema.get_field_index("p_name")
    part = part.set_column(
        ni,
        part.schema.field(ni),
        pa.array([vocab[r] for r in p_ranks], pa.string()),
    )
    _write_parts(part, f"{out_dir}/part.parquet")

    stressed = {"events", "documents", "part"}
    for table in (*COPY_AS_IS, *KEY_DOMAINS):
        if table in stressed:
            continue
        dst = f"{out_dir}/{table}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{base_dir}/{table}.parquet", dst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", ".scale"))
    ap.add_argument("--factors", nargs="+", type=int, default=[1, 5, 10])
    ap.add_argument("--force", action="store_true")
    ap.add_argument(
        "--zipf",
        action="store_true",
        help="also write the Zipf(1.2) skew-stress twin of sf0.5",
    )
    ap.add_argument(
        "--zipf-of",
        default=None,
        metavar="LABEL",
        help="write the Zipf(1.2) twin of .scale/sf{LABEL} to "
        ".scale/zipf{LABEL} (the sf dir must already exist)",
    )
    args = ap.parse_args()
    zipf_labels = (["0.5"] if args.zipf else []) + (
        [args.zipf_of] if args.zipf_of else []
    )
    for label in zipf_labels:
        zdir = os.path.abspath(os.path.join(args.out, f"zipf{label}"))
        src = os.path.abspath(os.path.join(args.out, f"sf{label}"))
        if args.force or not os.path.isdir(f"{zdir}/events.parquet"):
            zipf_variant(zdir, src)
            print(f"wrote {zdir}")
        else:
            print(f"skip {zdir} (exists)")
    if zipf_labels and len(args.factors) == 0:
        return
    spans = _domain_spans()
    for factor in args.factors:
        sf = factor * 0.1
        label = f"sf{sf:g}"
        out_dir = os.path.abspath(os.path.join(args.out, label))
        os.makedirs(out_dir, exist_ok=True)
        for table in (*COPY_AS_IS, *KEY_DOMAINS):
            dst = f"{out_dir}/{table}.parquet"
            if os.path.isdir(dst) and not args.force:
                print(f"skip {label}/{table} (exists)")
                continue
            if table in COPY_AS_IS:
                t = pq.read_table(f"{SRC}/{table}.parquet")
            else:
                t = _replicate(table, factor, spans)
            _write_parts(t, dst)
            print(f"wrote {label}/{table}: {t.num_rows} rows")


if __name__ == "__main__":
    main()
