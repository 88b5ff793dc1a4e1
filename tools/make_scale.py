#!/usr/bin/env python3
"""Build a scaled-up copy of an sf directory for scaling experiments.

Replicates the fact tables (orders, lineitem, events, documents,
embeddings) FACTOR times with disjoint key ranges, keeping the dimension
tables as-is — so per-key densities stay realistic (more orders per
customer, more users, more documents) and join/window semantics are
preserved. Replicas are perturbed so content-derived operators (dedup,
similarity) don't see artificial 100%-duplicate data:

- documents: each replica prepends a replica-specific token to the text
- embeddings: each replica rolls the vector by i positions (norms kept)
- events: user_id shifts per replica, so per-user event counts are
  unchanged (windows/sessions scale in key count, not key size)

Usage: tools/make_scale.py SRC_DIR DST_DIR FACTOR
(local tooling only — the Scala library never depends on this)
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SHIFT = 10_000_000

def main(src, dst, factor):
    import os
    os.makedirs(dst, exist_ok=True)
    for name in ["region", "nation", "customer", "supplier", "part"]:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet")

    orders = pq.read_table(f"{src}/orders.parquet").to_pandas()
    reps = []
    for i in range(factor):
        r = orders.copy()
        r["o_orderkey"] = r["o_orderkey"] + i * SHIFT
        reps.append(r)
    pq.write_table(pa.Table.from_pandas(__import__("pandas").concat(reps, ignore_index=True),
                                        preserve_index=False), f"{dst}/orders.parquet")

    li = pq.read_table(f"{src}/lineitem.parquet").to_pandas()
    reps = []
    for i in range(factor):
        r = li.copy()
        r["l_orderkey"] = r["l_orderkey"] + i * SHIFT
        reps.append(r)
    pq.write_table(pa.Table.from_pandas(__import__("pandas").concat(reps, ignore_index=True),
                                        preserve_index=False), f"{dst}/lineitem.parquet")

    ev = pq.read_table(f"{src}/events.parquet")
    schema = ev.schema  # keep TIMESTAMP(NANOS) exactly as the driver wrote it
    ev = ev.to_pandas()
    reps = []
    for i in range(factor):
        r = ev.copy()
        r["event_id"] = r["event_id"] + i * SHIFT
        r["user_id"] = r["user_id"] + i * SHIFT
        reps.append(r)
    allev = __import__("pandas").concat(reps, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(allev, schema=schema, preserve_index=False),
                   f"{dst}/events.parquet", version="2.6", coerce_timestamps=None)

    docs = pq.read_table(f"{src}/documents.parquet").to_pandas()
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
             "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi"]
    reps = []
    for i in range(factor):
        r = docs.copy()
        r["doc_id"] = r["doc_id"] + i * SHIFT
        if i > 0:
            prefix = vocab[i % len(vocab)] + " "
            r["text"] = prefix + r["text"]
            r["n_chars"] = r["n_chars"] + len(prefix)
        reps.append(r)
    pq.write_table(pa.Table.from_pandas(__import__("pandas").concat(reps, ignore_index=True),
                                        preserve_index=False), f"{dst}/documents.parquet")

    embt = pq.read_table(f"{src}/embeddings.parquet")
    emb_schema = embt.schema  # keep list<float32> — the library's native ops require it
    emb = embt.to_pandas()
    reps = []
    for i in range(factor):
        r = emb.copy()
        r["vec_id"] = r["vec_id"] + i * SHIFT
        if i > 0:
            r["embedding"] = r["embedding"].map(
                lambda v, k=i: np.roll(np.asarray(v, dtype=np.float32), k))
        reps.append(r)
    pq.write_table(pa.Table.from_pandas(__import__("pandas").concat(reps, ignore_index=True),
                                        schema=emb_schema, preserve_index=False),
                   f"{dst}/embeddings.parquet")
    print(f"wrote {dst} at {factor}x {src}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
