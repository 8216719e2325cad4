"""Generate the round-16 sf1.0 probe dataset (VERDICT r15 item 2).

No sf >= 1 driver data exists (/root/testdata stops at sf0.1 and is
read-only), so the first empirical scaling point is built here: a
DETERMINISTIC 10x upscale of sf0.1 into /tmp/sf1.0, designed as a
CONTROLLED experiment — each replica is a disjoint universe, so the
data's intrinsic pair/candidate structure scales EXACTLY linearly and
any super-linear wall-clock or candidate growth measured by
docs/scale_probe_sf1.py is attributable to the ENGINE (shuffle width,
skew handling, partition sizing), not to a density change in the data:

- documents (5,000 -> 50,000): replica k in 0..9, doc_id + k*10^7.
  For k >= 1 every whitespace token t becomes "t~rk" — a bijection on
  the token universe per replica, so within-replica Jaccard/shingle/
  minhash structure is bit-identical to sf0.1 while cross-replica
  token intersections are empty. True pair count and per-tau candidate
  counts are therefore exactly 10x sf0.1's.
- embeddings (2,000 -> 20,000): vec_id + k*10^7; replica k applies a
  seeded per-replica PERMUTATION of the vector dimensions (numpy
  default_rng(4200 + k)). Permutation preserves norms and
  within-replica cosines exactly; cross-replica cosines decorrelate,
  so nothing collapses into accidental exact-duplicate clusters.
- lineitem/orders (600k/150k -> 6M/1.5M): all join keys
  (l_orderkey/l_suppkey/l_partkey, o_orderkey/o_custkey) + k*10^9 —
  ten disjoint copies of the supplier/customer graph for the graph
  family.
- events (100k -> 1M): event_id/user_id offset the same way; ts
  shifted by k microseconds (keeps per-replica time structure, avoids
  10-way exact-timestamp ties).
- region/nation/customer/supplier/part: copied unchanged (dimension
  tables; the probe kernels don't scale on them).

Rerun-safe: wipes /tmp/sf1.0 first. ~1 min, ~1 GB.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1.0")
REPLICAS = 10


def main() -> None:
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    con = duckdb.connect()

    # --- documents: token-suffix bijection per replica ---
    parts = []
    for k in range(REPLICAS):
        if k == 0:
            parts.append(
                f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM read_parquet('{SRC}/documents.parquet')"
            )
        else:
            # suffix every whitespace token: split, map, re-join
            parts.append(
                f"SELECT doc_id + {k * 10**7} AS doc_id, "
                f"list_aggregate(list_transform(string_split_regex(trim(text), '\\s+'), "
                f"x -> x || '~r{k}'), 'string_agg', ' ') AS text, "
                f"lang, source, n_chars "
                f"FROM read_parquet('{SRC}/documents.parquet')"
            )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/documents.parquet' (FORMAT PARQUET)"
    )

    # --- embeddings: per-replica dimension permutation ---
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    out_ids, out_emb, out_lab = [], [], []
    for k in range(REPLICAS):
        perm = (
            np.arange(dim)
            if k == 0
            else np.random.default_rng(4200 + k).permutation(dim)
        )
        out_ids.append(vec_ids + k * 10**7)
        out_emb.append(emb[:, perm])
        out_lab.append(labels)
    all_emb = np.concatenate(out_emb)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
            "embedding": pa.array(
                [row for row in all_emb.tolist()], type=pa.list_(pa.float32())
            ),
            "label": pa.array(np.concatenate(out_lab), type=pa.int32()),
        }
    )
    pq.write_table(tbl, f"{DST}/embeddings.parquet")

    # --- lineitem / orders: key offsets, 10 disjoint graphs ---
    li_cols = (
        "l_orderkey + {o} AS l_orderkey, l_partkey + {o} AS l_partkey, "
        "l_suppkey + {o} AS l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        "l_shipdate"
    )
    parts = [
        f"SELECT {li_cols.format(o=k * 10**9)} FROM read_parquet('{SRC}/lineitem.parquet')"
        for k in range(REPLICAS)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)"
    )
    o_cols = (
        "o_orderkey + {o} AS o_orderkey, o_custkey + {o} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
    )
    parts = [
        f"SELECT {o_cols.format(o=k * 10**9)} FROM read_parquet('{SRC}/orders.parquet')"
        for k in range(REPLICAS)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/orders.parquet' (FORMAT PARQUET)"
    )

    # --- events: id/user offsets, +k microseconds ---
    parts = [
        f"SELECT event_id + {k * 10**9} AS event_id, "
        f"ts + INTERVAL ({k}) MICROSECOND AS ts, "
        f"user_id + {k * 10**9} AS user_id, event_type, value, props "
        f"FROM read_parquet('{SRC}/events.parquet')"
        for k in range(REPLICAS)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/events.parquet' (FORMAT PARQUET)"
    )

    # --- dimension tables: unchanged ---
    for name in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{name}.parquet", f"{DST}/{name}.parquet")

    for name in sorted(os.listdir(DST)):
        n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{DST}/{name}')").fetchone()[0]
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
