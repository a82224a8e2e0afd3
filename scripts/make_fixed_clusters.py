#!/usr/bin/env python
"""Fixed-duplicate-cluster corpus fixtures for the dedup-evaluation
decade (VERDICT r10 next #4).

The standard ``make_sf1``/``make_sf10`` upscale replicates each
document with a tiny ``repN`` marker, so the replicas of one original
form a NEAR-DUP CLUSTER THAT GROWS WITH N — which is why
``dedup_eval_sampled`` measured exp ~1.11 there (true pairs grew
×1019 for ×10 N — measured output growth, not a plan defect; see
``scripts/triage_dedup_eval.py``). The r10 triage's remaining claim —
"bounded clusters ⇒ linear" — needs a fixture where N grows but
duplicate-cluster size DOESN'T.

This generator builds exactly that: ×10 and ×100 replications of the
sf0.1 documents where every ODD-POSITION word gets a per-replica
suffix. Within one replica, the original corpus's near-dup structure
is preserved verbatim (two docs that shared word sequences still
share them — both carry the same positional suffixes). ACROSS
replicas, every 3-shingle contains at least one suffixed word, so
cross-replica shingle overlap is ~zero and replicas never pair:
duplicate clusters stay at their sf0.1 sizes while N grows ×10 / ×100.

Outputs ``testdata_sf1_fixed/documents.parquet`` and
``testdata_sf10_fixed/documents.parquet`` (documents only —
``dedup_eval_sampled`` scans nothing else).

Usage: python scripts/make_fixed_clusters.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = Path("/root/testdata/sf0.1")
ROOT = Path(__file__).resolve().parent.parent
KEY_STRIDE = 10_000_000


def build(out: Path, replicas: int) -> None:
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE reps AS "
        f"SELECT unnest(generate_series(0, {replicas - 1})) AS rep"
    )
    # suffix every odd-position word with the replica id: replica 0
    # stays the original corpus; any window of 3 consecutive words in
    # replica r contains a word ending in _r<r>, so no 3-shingle is
    # shared across replicas — cluster sizes are pinned at sf0.1's
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.rep * {KEY_STRIDE} AS doc_id,
                 CASE WHEN r.rep = 0 THEN d.text
                      ELSE array_to_string(
                        list_transform(
                          list_zip(string_split(d.text, ' '),
                                   generate_series(1, len(string_split(d.text, ' ')))),
                          z -> CASE WHEN z[2] % 2 = 0 THEN z[1]
                                    ELSE z[1] || '_r' || CAST(r.rep AS VARCHAR)
                               END),
                        ' ')
                 END AS text,
                 d.lang, d.source, d.n_chars
          FROM '{SRC}/documents.parquet' d CROSS JOIN reps r
          ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    n = con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    print(f"{out}: {n} docs ({replicas} replicas)")


def main() -> int:
    build(ROOT / "testdata_sf1_fixed", 10)
    build(ROOT / "testdata_sf10_fixed", 100)
    return 0


if __name__ == "__main__":
    sys.exit(main())
