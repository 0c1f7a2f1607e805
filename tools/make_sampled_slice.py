#!/usr/bin/env python3
"""Deterministic ~2k-doc sampled slice OF the 10x corpus, for running
the exact O(n^2) SQL oracles at full fidelity on 10x-corpus CONTENT
(suffixed cross-copy tokens, shifted n_chars) at a size where the
quadratic oracle is feasible.

Sampling is closed over nothing — it is a plain doc_id filter — so it
gates queries by re-running BOTH engines on the same sliced corpus
(graft.Verify <slice> out q1,..; oracle_check <slice> out), never by
filtering a full-corpus answer (component connectivity would not
survive that). The modulus 23 is coprime to the copy offset 1e6
(1e6 % 23 = 6), so each copy contributes a DIFFERENT subset of base
docs: the slice mixes per-copy near-dup neighborhoods instead of
repeating one.

Usage: python3 tools/make_sampled_slice.py <tenxDir> <outDir>
"""
import os, sys

MOD, RESIDUE = 23, 5

def main():
    src, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    import duckdb
    con = duckdb.connect()
    con.sql(f"""
    COPY (SELECT * FROM '{src}/documents.parquet'
          WHERE doc_id % {MOD} = {RESIDUE}
          ORDER BY doc_id)
    TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    n = con.sql(f"SELECT COUNT(*) FROM '{out}/documents.parquet'").fetchone()[0]
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.realpath(f"{src}/{name}.parquet"), dst)
    print(f"built {out}: {n} sampled docs (doc_id % {MOD} = {RESIDUE})")

if __name__ == "__main__":
    main()
