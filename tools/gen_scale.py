"""Deterministic scale-rung generator (VERDICT round 4 item 5).

Tiles the driver's sf0.1 testdata K times into ``scratch/sf1`` (K=10
by default) so the hot paths can be measured one rung above the bench
scale.  The driver's testdata is read-only and its generator is not
ours to re-run, so this SCALES the existing tables instead -- with
three properties a naive ``UNION ALL`` copy would violate:

- **referential integrity**: every foreign key is offset by
  ``replica * (max_key + 1)`` of its parent, so joins fan out exactly
  as at sf0.1 (no accidental key collisions, no dangling keys);
- **constant near-dup rate**: replica>0 document text gets a
  replica-specific token injected every 4 words, which rewrites every
  5-shingle -- tiled docs are NOT near-dups of their originals, so
  MinHash-LSH candidate volume scales linearly with the corpus like a
  real crawl, instead of quadratically like a copy-paste corpus;
- **preserved geometry**: embeddings get small deterministic
  N(0, 0.01) jitter (seeded per replica), keeping cluster structure
  and label balance while making every vector distinct.

``nation`` and ``region`` stay fixed (graph vertices / dim tables);
all fact-ish tables (customer supplier part orders lineitem events
documents embeddings) scale by K.

Usage: python tools/gen_scale.py [K] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _mx(con, table: str, col: str) -> int:
    return con.execute(
        f"SELECT MAX({col}) + 1 FROM "
        f"read_parquet('{SRC}/{table}.parquet')").fetchone()[0]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scratch/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    off = {t: _mx(con, t, c) for t, c in [
        ("documents", "doc_id"), ("embeddings", "vec_id"),
        ("orders", "o_orderkey"), ("customer", "c_custkey"),
        ("supplier", "s_suppkey"), ("part", "p_partkey"),
        ("events", "event_id")]}
    off["user"] = con.execute(
        f"SELECT MAX(user_id) + 1 FROM "
        f"read_parquet('{SRC}/events.parquet')").fetchone()[0]

    # dims: straight copy
    for t in ("nation", "region"):
        con.execute(f"COPY (SELECT * FROM "
                    f"read_parquet('{SRC}/{t}.parquet')) TO "
                    f"'{out}/{t}.parquet' (FORMAT PARQUET)")

    # numeric fact tables: one UNION ALL of key-offset replicas
    plans = {
        "customer": ("SELECT c_custkey + {r} * {oc} AS c_custkey, "
                     "c_name, c_nationkey, c_acctbal, c_mktsegment "
                     "FROM t"),
        "supplier": ("SELECT s_suppkey + {r} * {os} AS s_suppkey, "
                     "s_name, s_nationkey, s_acctbal FROM t"),
        "part": ("SELECT p_partkey + {r} * {op} AS p_partkey, p_name, "
                 "p_brand, p_type, p_size, p_retailprice FROM t"),
        "orders": ("SELECT o_orderkey + {r} * {oo} AS o_orderkey, "
                   "o_custkey + {r} * {oc} AS o_custkey, "
                   "o_orderstatus, o_totalprice, o_orderdate, "
                   "o_orderpriority FROM t"),
        "lineitem": ("SELECT l_orderkey + {r} * {oo} AS l_orderkey, "
                     "l_partkey + {r} * {op} AS l_partkey, "
                     "l_suppkey + {r} * {os} AS l_suppkey, "
                     "l_linenumber, l_quantity, l_extendedprice, "
                     "l_discount, l_tax, l_returnflag, l_linestatus, "
                     "l_shipdate FROM t"),
        "events": ("SELECT event_id + {r} * {oe} AS event_id, ts, "
                   "user_id + {r} * {ou} AS user_id, event_type, "
                   "value, props FROM t"),
    }
    subs = dict(oc=off["customer"], os=off["supplier"],
                op=off["part"], oo=off["orders"],
                oe=off["events"], ou=off["user"])
    for t, sel in plans.items():
        union = " UNION ALL ".join(
            sel.format(r=r, **subs) for r in range(k))
        con.execute(
            f"COPY (WITH t AS (SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')) {union}) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM "
                        f"read_parquet('{out}/{t}.parquet')"
                        ).fetchone()[0]
        print(f"{t}: {n} rows")

    # documents: python-side word-level perturbation for replica > 0
    doc = con.execute(f"SELECT * FROM "
                      f"read_parquet('{SRC}/documents.parquet') "
                      f"ORDER BY doc_id").fetchdf()
    frames = []
    for r in range(k):
        d = doc.copy()
        d["doc_id"] = d["doc_id"] + r * off["documents"]
        if r > 0:
            def perturb(text: str, rr=r) -> str:
                words = text.split(" ")
                out_w = []
                for i, w in enumerate(words):
                    out_w.append(w)
                    if i % 4 == 3:
                        out_w.append(f"r{rr}x{i >> 2}")
                return " ".join(out_w)
            d["text"] = d["text"].map(perturb)
            d["n_chars"] = d["text"].str.len().astype("int64")
        frames.append(d)
    import pandas as pd
    docs_all = pd.concat(frames, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(docs_all, preserve_index=False),
                   f"{out}/documents.parquet")
    print(f"documents: {len(docs_all)} rows")

    # embeddings: deterministic per-replica jitter
    emb = con.execute(f"SELECT * FROM "
                      f"read_parquet('{SRC}/embeddings.parquet') "
                      f"ORDER BY vec_id").fetchdf()
    base = np.stack(emb["embedding"].to_numpy()).astype("float32")
    eframes = []
    for r in range(k):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + r * off["embeddings"]
        if r > 0:
            rng = np.random.default_rng(42_000 + r)
            vecs = base + rng.normal(0, 0.01, base.shape).astype(
                "float32")
        else:
            vecs = base
        e["embedding"] = list(vecs)
        eframes.append(e)
    emb_all = pd.concat(eframes, ignore_index=True)
    tbl = pa.Table.from_pandas(emb_all, preserve_index=False)
    # match the source's list<float> element type
    idx = tbl.schema.get_field_index("embedding")
    tbl = tbl.set_column(
        idx, "embedding",
        tbl.column("embedding").cast(pa.list_(pa.float32())))
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"embeddings: {len(emb_all)} rows")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
