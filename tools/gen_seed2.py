"""Second-seed regeneration of the driver's sf0.01-shaped tables.

Every CORRECTNESS attestation to date ran against ONE fixed synthetic
generation (driver seed=42). A Spark query and its DuckDB oracle that
share a wrong distribution-tied assumption — a hot-bucket cap that
never trips at the shipped seed, a tie that never occurs, a dup
cluster that never forms — would agree forever on that draw. This tool
produces an independent draw of the SAME data model so the
full-registry parity gate can be re-run against it
(`SPARK_GRAFT_TEST_SF_DIR=.scale/seed2 pytest tests/test_oracle_parity.py`).

Method: resample, don't invent. Value DOMAINS are harvested from the
driver tables at runtime (categorical distinct sets, numeric/date
min–max ranges, the 31-word document vocabulary, token-count range,
embedding cluster count/pull), then every row is redrawn under a new
RNG. This keeps every literal predicate in the registry meaningful
(sentinel strings, mktsegment/brand/type filters, date windows) while
changing every tie, join fan-out, bucket population, and near-dup
cluster. Structural invariants preserved:

- serial PKs 0..N-1 per table; FKs drawn from the referenced key set;
- ``documents.n_chars == len(text)`` (the one derived column);
- region/nation copied as-is (fixed dimensions at every TPC-H SF);
- arrow schemas cast byte-for-byte from the source files (timestamp[us],
  int32/int64/float32 physical types identical).

Deliberately different from the shipped draw (beyond the new RNG):
documents plant MORE near-dup pairs (~12 mutated-copy pairs + 2 exact
duplicate texts vs 0 exact / ~few near at seed 42), so dedup branches
that the shipped seed never exercises (exact-dup grouping, larger LSH
buckets) actually run.

Usage: python tools/gen_seed2.py [--out .scale/seed2] [--src /root/testdata/sf0.01] [--seed 777]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"


def _read(src: str, table: str) -> pa.Table:
    return pq.read_table(os.path.join(src, f"{table}.parquet"))


def _write(out: str, table: str, arrays: dict, schema: pa.Schema) -> None:
    cols = [pa.array(arrays[f.name]).cast(f.type) for f in schema]
    t = pa.Table.from_arrays(cols, schema=pa.schema([(f.name, f.type) for f in schema]))
    pq.write_table(t, os.path.join(out, f"{table}.parquet"))


def _cats(col) -> list:
    return sorted(set(col.to_pylist()))


def gen(src: str, out: str, seed: int) -> dict:
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(seed)
    report: dict = {"seed": seed, "src": src}

    # region / nation: fixed dimension tables, copy byte-for-byte
    for t in ("region", "nation"):
        pq.write_table(_read(src, t), os.path.join(out, f"{t}.parquet"))

    nation = _read(src, "nation")
    n_nations = nation.num_rows

    # ---- customer ----------------------------------------------------
    s_cust = _read(src, "customer")
    n = s_cust.num_rows
    segs = _cats(s_cust["c_mktsegment"])
    bal_lo, bal_hi = -1000.0, 10000.0
    _write(
        out,
        "customer",
        {
            "c_custkey": np.arange(n, dtype=np.int64),
            "c_name": [f"Customer#{k:09d}" for k in range(n)],
            "c_nationkey": rng.randint(0, n_nations, n),
            "c_acctbal": np.round(rng.uniform(bal_lo, bal_hi, n), 2),
            "c_mktsegment": [segs[i] for i in rng.randint(0, len(segs), n)],
        },
        s_cust.schema,
    )
    n_cust = n

    # ---- supplier ----------------------------------------------------
    s_sup = _read(src, "supplier")
    n = s_sup.num_rows
    _write(
        out,
        "supplier",
        {
            "s_suppkey": np.arange(n, dtype=np.int64),
            "s_name": [f"Supplier#{k:09d}" for k in range(n)],
            "s_nationkey": rng.randint(0, n_nations, n),
            "s_acctbal": np.round(rng.uniform(bal_lo, bal_hi, n), 2),
        },
        s_sup.schema,
    )
    n_sup = n

    # ---- part --------------------------------------------------------
    s_part = _read(src, "part")
    n = s_part.num_rows
    names = s_part["p_name"].to_pylist()
    adjs = sorted({x.split()[0] for x in names})
    nouns = sorted({x.split()[1] for x in names})
    brands = _cats(s_part["p_brand"])
    ptypes = _cats(s_part["p_type"])
    _write(
        out,
        "part",
        {
            "p_partkey": np.arange(n, dtype=np.int64),
            "p_name": [
                f"{adjs[a]} {nouns[b]}"
                for a, b in zip(rng.randint(0, len(adjs), n), rng.randint(0, len(nouns), n))
            ],
            "p_brand": [brands[i] for i in rng.randint(0, len(brands), n)],
            "p_type": [ptypes[i] for i in rng.randint(0, len(ptypes), n)],
            "p_size": rng.randint(1, 51, n),
            "p_retailprice": np.round(rng.uniform(900.0, 1000.0, n), 2),
        },
        s_part.schema,
    )
    n_part = n

    # ---- orders ------------------------------------------------------
    s_ord = _read(src, "orders")
    n = s_ord.num_rows
    statuses = _cats(s_ord["o_orderstatus"])
    prios = _cats(s_ord["o_orderpriority"])
    d0 = np.datetime64("1995-01-01")
    span_days = int(
        (np.datetime64("2001-08-01") - d0) / np.timedelta64(1, "D")
    )
    odates = d0 + rng.randint(0, span_days + 1, n).astype("timedelta64[D]")
    _write(
        out,
        "orders",
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": rng.randint(0, n_cust, n).astype(np.int64),
            "o_orderstatus": [statuses[i] for i in rng.randint(0, len(statuses), n)],
            "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n), 2),
            "o_orderdate": odates.astype("datetime64[us]"),
            "o_orderpriority": [prios[i] for i in rng.randint(0, len(prios), n)],
        },
        s_ord.schema,
    )
    n_ord = n

    # ---- lineitem ----------------------------------------------------
    s_li = _read(src, "lineitem")
    n = s_li.num_rows
    rflags = _cats(s_li["l_returnflag"])
    lstats = _cats(s_li["l_linestatus"])
    sd0 = np.datetime64("1995-01-02")
    sd_span = int((np.datetime64("2001-11-04") - sd0) / np.timedelta64(1, "D"))
    _write(
        out,
        "lineitem",
        {
            "l_orderkey": rng.randint(0, n_ord, n).astype(np.int64),
            "l_partkey": rng.randint(0, n_part, n).astype(np.int64),
            "l_suppkey": rng.randint(0, n_sup, n).astype(np.int64),
            "l_linenumber": rng.randint(1, 8, n),
            "l_quantity": rng.randint(1, 51, n).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(901.0, 105000.0, n), 2),
            "l_discount": np.round(rng.randint(0, 11, n) * 0.01, 2),
            "l_tax": np.round(rng.randint(0, 9, n) * 0.01, 2),
            "l_returnflag": [rflags[i] for i in rng.randint(0, len(rflags), n)],
            "l_linestatus": [lstats[i] for i in rng.randint(0, len(lstats), n)],
            "l_shipdate": (
                sd0 + rng.randint(0, sd_span + 1, n).astype("timedelta64[D]")
            ).astype("datetime64[us]"),
        },
        s_li.schema,
    )

    # ---- events ------------------------------------------------------
    s_ev = _read(src, "events")
    n = s_ev.num_rows
    etypes = _cats(s_ev["event_type"])
    uid_max = int(pa.compute.max(s_ev["user_id"]).as_py())
    # exponential inter-arrival gaps, same ~30-day window shape
    gaps = rng.exponential(259.0, n)
    ts = (
        np.datetime64("2024-01-01T00:00:00")
        + (np.cumsum(gaps) * 1e6).astype("timedelta64[us]")
    )
    _write(
        out,
        "events",
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.randint(0, uid_max + 1, n).astype(np.int64),
            "event_type": [etypes[i] for i in rng.randint(0, len(etypes), n)],
            "value": np.round(rng.exponential(35.0, n) + 0.01, 2),
            "props": [f'{{"k": {k}}}' for k in rng.randint(0, 100, n)],
        },
        s_ev.schema,
    )

    # ---- documents ---------------------------------------------------
    s_doc = _read(src, "documents")
    n = s_doc.num_rows
    vocab = sorted({w for t in s_doc["text"].to_pylist() for w in t.split()})
    langs, lang_counts = np.unique(
        np.asarray(s_doc["lang"].to_pylist()), return_counts=True
    )
    lang_p = lang_counts / lang_counts.sum()
    sources = sorted(set(s_doc["source"].to_pylist()))
    texts = []
    for _ in range(n):
        k = rng.randint(10, 100)
        texts.append(" ".join(vocab[i] for i in rng.randint(0, len(vocab), k)))
    # plant near-dups: copy a doc, mutate ~5% of its words
    near_pairs = []
    for _ in range(12):
        i, j = rng.choice(n, 2, replace=False)
        toks = texts[i].split()
        n_mut = max(1, len(toks) // 20)
        for pos in rng.choice(len(toks), n_mut, replace=False):
            toks[pos] = vocab[rng.randint(0, len(vocab))]
        texts[j] = " ".join(toks)
        near_pairs.append((int(i), int(j)))
    # plant exact dups (0 existed at the shipped seed)
    exact_pairs = []
    for _ in range(2):
        i, j = rng.choice(n, 2, replace=False)
        texts[j] = texts[i]
        exact_pairs.append((int(i), int(j)))
    # balanced source assignment (25 per src at sf0.01), shuffled
    src_assign = np.repeat(np.arange(len(sources)), n // len(sources) + 1)[:n]
    rng.shuffle(src_assign)
    _write(
        out,
        "documents",
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": [str(langs[i]) for i in rng.choice(len(langs), n, p=lang_p)],
            "source": [sources[i] for i in src_assign],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        },
        s_doc.schema,
    )
    report["planted_near_pairs"] = near_pairs
    report["planted_exact_pairs"] = exact_pairs

    # ---- embeddings --------------------------------------------------
    s_emb = _read(src, "embeddings")
    n = s_emb.num_rows
    dim = len(s_emb["embedding"][0])
    n_labels = len(set(s_emb["label"].to_pylist()))
    centers = rng.normal(0, 1, (n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_labels, n)
    # weak cluster pull matching the shipped draw (~0.14 mean cos to centroid):
    # x = a*center + noise with a tuned so E[cos] lands in that regime
    pts = 0.30 * centers[labels] + rng.normal(0, 1, (n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    _write(
        out,
        "embeddings",
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in pts],
            "label": labels.astype(np.int32),
        },
        s_emb.schema,
    )

    with open(os.path.join(out, "GEN_REPORT.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--out", default=".scale/seed2")
    ap.add_argument("--seed", type=int, default=777)
    args = ap.parse_args()
    rep = gen(args.src, os.path.abspath(args.out), args.seed)
    print(json.dumps({k: v for k, v in rep.items() if k != "planted_near_pairs"}))


if __name__ == "__main__":
    main()
