#!/usr/bin/env python
"""Generate a deterministic ~10× upscale of the sf0.1 `documents` and
`embeddings` tables at testdata_sf1/ (plus copies of the untouched
tables), so the flat-overhead llmdata queries can be measured one
decade further — where data work, not job latency, should dominate.

Upscale rule (pure function of (row, replica), no RNG state):
- ids are re-keyed as ``id + replica * 10_000_000`` (keeps int64,
  keeps id order within a replica, never collides across replicas);
- document text gets a per-replica marker token appended so exact
  dedup doesn't collapse the corpus to 1/10th;
- embeddings are perturbed per-dim by a tiny deterministic offset
  (``(hash(vec_id, replica, dim) % 1000 - 500) * 1e-6``) so ANN /
  near-dup work isn't degenerate exact-duplicate matching.

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
    for f in SRC.glob("*.parquet"):
        if f.name not in ("documents.parquet", "embeddings.parquet"):
            shutil.copyfile(f, out / f.name)

    for t in ("documents", "embeddings"):
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
