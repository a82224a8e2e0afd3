#!/usr/bin/env python
"""Generate a deterministic ~10× upscale of the sf0.1 FACT tables at
testdata_sf1/ — `documents`, `embeddings`, and (r8, VERDICT task #6)
the relational/event facts `orders`, `lineitem`, `events` — plus
copies of the dimension tables, so every query family can be measured
one decade further, where data work (not job latency) dominates.

Upscale rule (pure function of (row, replica), no RNG state):
- ids are re-keyed as ``id + replica * 10_000_000`` (keeps int64,
  keeps id order within a replica, never collides across replicas);
- document text gets a per-replica marker token appended so exact
  dedup doesn't collapse the corpus to 1/10th;
- embeddings are perturbed per-dim by a tiny deterministic offset
  (``(hash(vec_id, replica, dim) % 1000 - 500) * 1e-6``) so ANN /
  near-dup work isn't degenerate exact-duplicate matching;
- orders/lineitem replicate with ``o_orderkey``/``l_orderkey``
  re-keyed IN LOCKSTEP, so the order↔line join structure of each
  replica is intact; dim FKs (cust/part/supp) are left unchanged —
  dims are not upscaled, so per-dim fan-out grows 10× (exactly what
  happens to a real dimension when the fact table grows);
- events re-key BOTH ``event_id`` and ``user_id``: new users, same
  per-user series length — the realistic growth mode for an event
  stream, and it keeps per-key window state bounded instead of
  silently 10×-ing every series.

Usage: python scripts/make_sf1.py [out_dir]  (default testdata_sf1/)
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

SRC = Path("/root/testdata/sf0.1")
REPLICAS = 10
KEY_STRIDE = 10_000_000


def main() -> int:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else
               Path(__file__).resolve().parent.parent / "testdata_sf1")
    out.mkdir(parents=True, exist_ok=True)

    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(generate_series(0, {REPLICAS - 1})) AS rep")

    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.rep * {KEY_STRIDE} AS doc_id,
                 CASE WHEN r.rep = 0 THEN d.text
                      ELSE d.text || ' rep' || CAST(r.rep AS VARCHAR) END AS text,
                 d.lang, d.source, d.n_chars
          FROM '{SRC}/documents.parquet' d CROSS JOIN reps r
          ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.rep * {KEY_STRIDE} AS vec_id,
                 CASE WHEN r.rep = 0 THEN e.embedding
                      ELSE list_transform(
                        list_zip(e.embedding,
                                 generate_series(1, len(e.embedding))),
                        z -> CAST(z[1] + (CAST(hash(e.vec_id, r.rep, z[2]) % 1000 AS BIGINT) - 500)
                                  * 0.000001 AS FLOAT))
                 END AS embedding,
                 e.label
          FROM '{SRC}/embeddings.parquet' e CROSS JOIN reps r
          ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT o.o_orderkey + r.rep * {KEY_STRIDE} AS o_orderkey,
                 o.o_custkey, o.o_orderstatus, o.o_totalprice,
                 o.o_orderdate, o.o_orderpriority
          FROM '{SRC}/orders.parquet' o CROSS JOIN reps r
          ORDER BY o_orderkey
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT l.l_orderkey + r.rep * {KEY_STRIDE} AS l_orderkey,
                 l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity,
                 l.l_extendedprice, l.l_discount, l.l_tax,
                 l.l_returnflag, l.l_linestatus, l.l_shipdate
          FROM '{SRC}/lineitem.parquet' l CROSS JOIN reps r
          ORDER BY l_orderkey, l_linenumber
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + r.rep * {KEY_STRIDE} AS event_id,
                 e.ts,
                 e.user_id + r.rep * {KEY_STRIDE} AS user_id,
                 e.event_type, e.value, e.props
          FROM '{SRC}/events.parquet' e CROSS JOIN reps r
          ORDER BY event_id
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )
    upscaled = ("documents", "embeddings", "orders", "lineitem", "events")
    for f in SRC.glob("*.parquet"):
        if f.stem not in upscaled:
            shutil.copyfile(f, out / f.name)

    for t in upscaled:
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
