#!/usr/bin/env python
"""Build a 10x-rows fixture from /root/testdata/sf0.1 for the scaling
measurement recorded in SCALE.md (the "would this survive 100x" claim,
measured instead of argued).

Design: each table is replicated FACTOR times with key offsets so joins
and group cardinalities scale, not just row counts. ``documents.text`` is
word-suffixed per copy (``w`` -> ``w_k``): copies share NO shingles with
each other or the original, so the per-shingle document-frequency
distribution — the quantity that drives jaccard/minhash candidate-pair
density — is identical to sf0.1 within each copy, and total pair volume
scales linearly. Plain replication would instead make every document a
member of a FACTOR-clique of exact near-dups (quadratic pair blowup that
no real corpus growth produces). ``events`` keeps its time range (10x
density per window — the "same period, more traffic" scaling mode that
stresses window/state size).

Output: /root/repo/.scalefix/sf1/*.parquet (gitignored; ~10x sf0.1).
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
# FACTOR/DST overridable: SCALEFIX_FACTOR=100 builds the ~1.5 GB 100x
# fixture (.scalefix/sf10) for the direct "survives 100x" measurement.
FACTOR = int(os.environ.get("SCALEFIX_FACTOR", "10"))
DST = os.environ.get(
    "SCALEFIX_DST",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scalefix",
        "sf1" if FACTOR == 10 else f"sf{FACTOR // 10}",
    ),
)

# table -> (id columns to offset, offset stride per copy)
OFFSETS = {
    "documents": {"doc_id": 10_000_000},
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "lineitem": {"l_orderkey": 100_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "customer": {"c_custkey": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for table, offs in OFFSETS.items():
        src = f"{SRC}/{table}.parquet"
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        select_parts = []
        for c in cols:
            if c in offs:
                select_parts.append(f"{c} + k.k * {offs[c]} AS {c}")
            elif table == "documents" and c == "text":
                # suffix every word with the copy index; copy 0 == original
                select_parts.append(
                    "CASE WHEN k.k = 0 THEN text "
                    "ELSE regexp_replace(text, '(\\S+)', '\\1_' || k.k, 'g') END AS text"
                )
            else:
                select_parts.append(c)
        q = (
            f"COPY (SELECT {', '.join(select_parts)} FROM '{src}', "
            f"(SELECT unnest(range({FACTOR})) AS k) k) "
            f"TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
        )
        con.execute(q)
        n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")
    # small dims: copy through unchanged (joins against them stay valid)
    for table in ("region", "nation", "supplier", "part"):
        src = f"{SRC}/{table}.parquet"
        if os.path.exists(src):
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    print("done:", DST)


if __name__ == "__main__":
    main()
