#!/usr/bin/env python
"""Generate a deterministic ~100× upscale of the sf0.1 corpus tables
at testdata_sf10/ — `documents` and `embeddings` (VERDICT r8 next #8:
the sf10 spot-decade targets the dedup/ANN core), plus — since r11
(VERDICT r10 next #4) — `orders` and `events` so the training/eval
family (target_encode, temporal_split, column_profile) gets a real
sf1→sf10 decade too. Remaining dims are copied unchanged so the
directory satisfies any helper that probes them.

Same upscale rules as scripts/make_sf1.py (pure function of
(row, replica), no RNG state): re-keyed ids at KEY_STRIDE, per-replica
text marker so exact dedup doesn't collapse the corpus, per-dim
deterministic embedding perturbation so ANN work isn't degenerate.
sf10 of the corpus = 200k documents / 200k vectors — one decade past
testdata_sf1, so exponents measured 0.1→1 get a second decade 1→10
to confirm they were slopes, not luck.

Usage: python scripts/make_sf10.py [out_dir]  (default testdata_sf10/)
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

SRC = Path("/root/testdata/sf0.1")
REPLICAS = 100
KEY_STRIDE = 10_000_000


def main() -> int:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else
               Path(__file__).resolve().parent.parent / "testdata_sf10")
    out.mkdir(parents=True, exist_ok=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE reps AS "
        f"SELECT unnest(generate_series(0, {REPLICAS - 1})) AS rep"
    )

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
    # r11 (VERDICT r10 next #4): the training/eval family decade needs
    # the RELATIONAL facts these queries scan upscaled too —
    # target_encode reads orders, temporal_split reads events. The
    # shapes EXTEND testdata_sf1's conventions so sf1→sf10 is a clean
    # ×10-rows decade: sf1 keeps o_custkey across its 10 replicas
    # (customer groups grow to ~100 orders), so sf10 rekeys custkey
    # once per TEN replicas — ×10 the customers, group size pinned at
    # sf1's ~100; events rekey user_id per replica exactly as sf1
    # does (more users, same per-user activity).
    con.execute(
        f"""
        COPY (
          SELECT o.o_orderkey + r.rep * {KEY_STRIDE} AS o_orderkey,
                 o.o_custkey + (r.rep // 10) * {KEY_STRIDE} AS o_custkey,
                 o.o_orderstatus, o.o_totalprice, o.o_orderdate,
                 o.o_orderpriority
          FROM '{SRC}/orders.parquet' o CROSS JOIN reps r
          ORDER BY o_orderkey
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
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
    upscaled = ("documents", "embeddings", "orders", "events")
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
