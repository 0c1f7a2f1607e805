#!/usr/bin/env python3
"""Build the bench-only 10x-sf0.1 corpus used by the scaling curves
(SURVEY 5a.1). NOT an input for correctness gates -- the driver's
testdata stays authoritative; this exists to extend wall-time-vs-rows
fits one more decade (5000 -> 50000 docs, 100k -> 1M events).

Mutation rules keep workload character honest:
- documents: copies re-keyed (+copy*1e6) with EVERY token suffixed
  "_c<copy>" so cross-copy token sets are disjoint -- near-dup
  structure is preserved WITHIN each copy, none invented across.
- embeddings: copies re-keyed, vectors cyclically rotated by the copy
  index (norm-preserving, direction-changing).
- events: copies re-keyed by user_id/event_id offset (per-vessel
  density constant -- how a fleet warehouse actually grows); written
  via pyarrow so the physical ts encoding matches the driver's files.
- all other tables symlink to sf0.1.

Usage: python3 tools/make_scaled_corpus.py [outdir]   (default /tmp/graft_sf1)
Then:  SPARK_GRAFT_SCALING=1 SPARK_GRAFT_SCALING_SFS=...,<outdir> ...
"""
import os, sys

SRC = "/root/testdata/sf0.1"
COPIES = 10

def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    os.makedirs(out, exist_ok=True)
    import duckdb
    con = duckdb.connect()
    con.sql(f"""
    COPY (
      SELECT doc_id, text, lang, source, n_chars FROM '{SRC}/documents.parquet'
      UNION ALL
      SELECT d.doc_id + c.copy * 1000000,
             list_aggregate(list_transform(string_split(d.text, ' '),
               t -> t || '_c' || c.copy), 'string_agg', ' '),
             d.lang, d.source,
             CAST(length(list_aggregate(list_transform(string_split(d.text, ' '),
               t -> t || '_c' || c.copy), 'string_agg', ' ')) AS BIGINT)
      FROM '{SRC}/documents.parquet' d,
           (SELECT unnest(range(1, {COPIES})) AS copy) c
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
    COPY (
      SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'
      UNION ALL
      SELECT e.vec_id + c.copy * 1000000,
             list_slice(e.embedding, c.copy + 1, 64) || list_slice(e.embedding, 1, c.copy),
             e.label
      FROM '{SRC}/embeddings.parquet' e,
           (SELECT unnest(range(1, {COPIES})) AS copy) c
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    # events via pyarrow: preserves the driver's physical ts encoding
    # verbatim (ns historically, us today; Tables.events normalizes
    # both) — a DuckDB COPY would silently rewrite it
    import pyarrow as pa, pyarrow.parquet as pq, pyarrow.compute as pc
    t = pq.read_table(f"{SRC}/events.parquet")
    parts = [t]
    for c in range(1, COPIES):
        parts.append(
            t.set_column(t.schema.get_field_index("event_id"), "event_id",
                         pc.add(t["event_id"], 10000000 * c))
             .set_column(t.schema.get_field_index("user_id"), "user_id",
                         pc.add(t["user_id"], 100000 * c)))
    pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet", version="2.6")
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem"):
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"built {out}")

if __name__ == "__main__":
    main()
