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

Replicas are written INCREMENTALLY (one parquet row group per replica,
round 14) so peak memory is ~2 source tables, not FACTOR of them — the
~100x probe corpora need this; the old concat-everything path held the
whole output in pandas.

Usage: tools/make_scale.py SRC_DIR DST_DIR FACTOR
(local tooling only — the Scala library never depends on this)
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SHIFT = 10_000_000


def replicate(src_path, dst_path, factor, schema, perturb):
    """Stream FACTOR perturbed replicas of one table, one row group each."""
    base = pq.read_table(src_path).to_pandas()
    writer = pq.ParquetWriter(dst_path, schema, version="2.6")
    try:
        for i in range(factor):
            r = perturb(base.copy(), i)
            writer.write_table(
                pa.Table.from_pandas(r, schema=schema, preserve_index=False))
    finally:
        writer.close()


def main(src, dst, factor):
    import os
    os.makedirs(dst, exist_ok=True)
    for name in ["region", "nation", "customer", "supplier", "part"]:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"), f"{dst}/{name}.parquet")

    def shift_keys(cols):
        def f(r, i):
            for c in cols:
                r[c] = r[c] + i * SHIFT
            return r
        return f

    orders_schema = pq.read_schema(f"{src}/orders.parquet")
    replicate(f"{src}/orders.parquet", f"{dst}/orders.parquet", factor,
              orders_schema, shift_keys(["o_orderkey"]))

    li_schema = pq.read_schema(f"{src}/lineitem.parquet")
    replicate(f"{src}/lineitem.parquet", f"{dst}/lineitem.parquet", factor,
              li_schema, shift_keys(["l_orderkey"]))

    # keep TIMESTAMP(NANOS) exactly as the driver wrote it
    ev_schema = pq.read_schema(f"{src}/events.parquet")
    replicate(f"{src}/events.parquet", f"{dst}/events.parquet", factor,
              ev_schema, shift_keys(["event_id", "user_id"]))

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
             "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi"]

    def perturb_docs(r, i):
        r["doc_id"] = r["doc_id"] + i * SHIFT
        if i > 0:
            prefix = vocab[i % len(vocab)] + " "
            r["text"] = prefix + r["text"]
            r["n_chars"] = r["n_chars"] + len(prefix)
        return r

    docs_schema = pq.read_schema(f"{src}/documents.parquet")
    replicate(f"{src}/documents.parquet", f"{dst}/documents.parquet", factor,
              docs_schema, perturb_docs)

    def perturb_emb(r, i):
        r["vec_id"] = r["vec_id"] + i * SHIFT
        if i > 0:
            r["embedding"] = r["embedding"].map(
                lambda v, k=i: np.roll(np.asarray(v, dtype=np.float32), k))
        return r

    # keep list<float32> — the library's native ops require it
    emb_schema = pq.read_schema(f"{src}/embeddings.parquet")
    replicate(f"{src}/embeddings.parquet", f"{dst}/embeddings.parquet", factor,
              emb_schema, perturb_emb)
    print(f"wrote {dst} at {factor}x {src}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
