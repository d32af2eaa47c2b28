#!/usr/bin/env python3
"""Scale-replay for q_dedup_band_sweep (builder-side tooling).

The declared DuckDB oracle computes its shingle-intersection table
(`inter`) over ALL corpus document pairs that share any shingle — fine
at the sf0.01 gate and at sf1, but at sf3 (150k docs, clone-compounded
shingle postings) that global join spilled >200 GB of DuckDB temp and
filled the device. The ENGINE (ops/Dedup.scala qDedupBandSweep) never
does that: it scores only the capped CANDIDATE pairs against per-doc
shingle sets, so its work is bounded by buckets*cap^2/2 per config.

This replay produces the identical output feasibly at any sf, in three
moves the one-query spellings lacked (each failure measured at sf3):
  1. candidate-restricted intersection — the oracle's `scored` CTE only
     ever reads `inter` rows for candidate pairs, so the global join's
     other rows are dead weight (global: filled a 252 GB device);
  2. an INTEGER shingle dictionary — ~60-byte shingle strings riding a
     |pairs| x avg-shingles exploded intermediate spilled 60+ GiB, and
     list_intersect is worse (full list payloads per pair row); 8-byte
     sids keep the exploded shape exact at ~1/8 the bytes;
  3. staged temp tables + a CHUNKED pair-scoring join — DuckDB inlines
     (re-executes) a CTE per reference, and even the sid spelling
     aggregated an ~900M-row intermediate in one pass (70+ GiB spill);
     scoring ~600k pairs per pass keeps each pass in memory.

Usage: check_bandsweep_sf.py <sfDir> <outDir>   (exit 0 iff match)
Compares cell-for-cell against the engine dump. Constants mirrored from
ops/Dedup.scala: BandSweepMaxDf=64, 8-plane 2xmd5 minhash signature,
configs (1,8),(2,4),(4,2),(8,1).
"""
import sys

import duckdb

# 8-plane 2x md5 minhash signature per doc (reads the staged `sh` table)
MH_SQL = """
WITH hx AS (SELECT doc_id, md5('0:' || sh) AS m0, md5('1:' || sh) AS m1
            FROM sh)
SELECT doc_id,
  min(substring(m0, 1, 8))  AS h0, min(substring(m0, 9, 8))  AS h1,
  min(substring(m0, 17, 8)) AS h2, min(substring(m0, 25, 8)) AS h3,
  min(substring(m1, 1, 8))  AS h4, min(substring(m1, 9, 8))  AS h5,
  min(substring(m1, 17, 8)) AS h6, min(substring(m1, 25, 8)) AS h7
FROM hx GROUP BY doc_id
"""

# per-config band rows: every (bands x rows/band) partition of the
# 8-plane signature, one row per (doc, cfg, band_no)
BANDS_SQL = """
SELECT doc_id, 1 AS cfg, 0 AS band_no,
       h0 || h1 || h2 || h3 || h4 || h5 || h6 || h7 AS band FROM mh
UNION ALL SELECT doc_id, 2, 0, h0 || h1 || h2 || h3 FROM mh
UNION ALL SELECT doc_id, 2, 1, h4 || h5 || h6 || h7 FROM mh
UNION ALL SELECT doc_id, 4, 0, h0 || h1 FROM mh
UNION ALL SELECT doc_id, 4, 1, h2 || h3 FROM mh
UNION ALL SELECT doc_id, 4, 2, h4 || h5 FROM mh
UNION ALL SELECT doc_id, 4, 3, h6 || h7 FROM mh
UNION ALL SELECT doc_id, 8, 0, h0 FROM mh
UNION ALL SELECT doc_id, 8, 1, h1 FROM mh
UNION ALL SELECT doc_id, 8, 2, h2 FROM mh
UNION ALL SELECT doc_id, 8, 3, h3 FROM mh
UNION ALL SELECT doc_id, 8, 4, h4 FROM mh
UNION ALL SELECT doc_id, 8, 5, h5 FROM mh
UNION ALL SELECT doc_id, 8, 6, h6 FROM mh
UNION ALL SELECT doc_id, 8, 7, h7 FROM mh
"""

# final assembly over the staged tables (cand_s, sizes, inter, capped)
FINAL_SQL = """
WITH scored AS (SELECT c.cfg,
     coalesce(i.n_inter, 0) AS ni,
     sa.nsh + sb.nsh - coalesce(i.n_inter, 0) AS nu
   FROM cand_s c
   JOIN sizes sa ON sa.doc_id = c.a
   JOIN sizes sb ON sb.doc_id = c.b
   LEFT JOIN inter i ON i.a = c.a AND i.b = c.b),
 agg AS (SELECT cfg, count(*) AS nc,
     count(*) FILTER (WHERE 2 * ni >= nu) AS nt
   FROM scored GROUP BY cfg)
SELECT t.cfg AS n_bands,
  CAST(8 // t.cfg AS BIGINT) AS rows_per_band,
  CAST(coalesce(cp.ncap, 0) AS BIGINT) AS n_capped_bands,
  CAST(coalesce(a.nc, 0) AS BIGINT) AS n_candidates,
  CAST(coalesce(a.nt, 0) AS BIGINT) AS n_true,
  CASE WHEN coalesce(a.nc, 0) = 0 THEN CAST(0 AS BIGINT)
       ELSE CAST((2000000 * coalesce(a.nt, 0) + coalesce(a.nc, 0))
                 // (2 * coalesce(a.nc, 0)) AS BIGINT) END
    AS precision_ppm
FROM (VALUES (1), (2), (4), (8)) t(cfg)
LEFT JOIN agg a ON a.cfg = t.cfg
LEFT JOIN capped cp ON cp.cfg = t.cfg
ORDER BY n_bands
"""


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.sql("SET max_temp_directory_size='60GiB'")
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    con.sql("""CREATE TEMP TABLE sh AS
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents)
        SELECT DISTINCT doc_id, unnest(list_transform(
            range(1, greatest(len(tk) - 1, 1) + 1),
            i -> array_to_string(tk[i:i+1], ' '))) AS sh FROM toks""")
    con.sql("""CREATE TEMP TABLE shi AS
        WITH dict AS (SELECT sh, row_number() OVER (ORDER BY sh) AS sid
                      FROM (SELECT DISTINCT sh FROM sh))
        SELECT s.doc_id, d.sid FROM sh s JOIN dict d USING (sh)""")
    con.sql("CREATE TEMP TABLE sizes AS "
            "SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id")
    con.sql(f"CREATE TEMP TABLE mh AS {MH_SQL}")
    con.sql(f"CREATE TEMP TABLE bands_s AS {BANDS_SQL}")
    con.sql("""CREATE TEMP TABLE cand_s AS
        WITH bands_k AS (SELECT * FROM bands_s
               QUALIFY count(*) OVER (PARTITION BY cfg, band_no, band)
                 <= 64)
        SELECT DISTINCT x.cfg, x.doc_id AS a, y.doc_id AS b
        FROM bands_k x JOIN bands_k y
          ON x.cfg = y.cfg AND x.band_no = y.band_no
         AND x.band = y.band AND x.doc_id < y.doc_id""")
    con.sql("""CREATE TEMP TABLE capped AS
        SELECT cfg, count(*) AS ncap FROM (
            SELECT cfg, band_no, band, count(*) AS df
            FROM bands_s GROUP BY cfg, band_no, band)
        WHERE df > 64 GROUP BY cfg""")
    con.sql("CREATE TEMP TABLE cand_d AS SELECT DISTINCT a, b FROM cand_s")
    n_pairs = con.sql("SELECT count(*) FROM cand_d").fetchone()[0]
    chunks = max(1, (n_pairs + 599_999) // 600_000)
    print(f"scoring {n_pairs} distinct pairs in {chunks} chunks",
          flush=True)
    con.sql("CREATE TEMP TABLE inter (a BIGINT, b BIGINT, n_inter BIGINT)")
    for i in range(chunks):
        con.sql(f"""INSERT INTO inter
            SELECT c.a, c.b, count(*) AS n_inter
            FROM cand_d c
            JOIN shi x ON x.doc_id = c.a
            JOIN shi y ON y.doc_id = c.b AND y.sid = x.sid
            WHERE c.a % {chunks} = {i}
            GROUP BY 1, 2""")
    want = con.sql(FINAL_SQL).fetchall()
    got = con.sql(
        f"SELECT * FROM "
        f"read_parquet('{out_dir}/q_dedup_band_sweep/*.parquet') "
        f"ORDER BY n_bands").fetchall()
    if got == want:
        print(f"  + q_dedup_band_sweep: OK ({len(got)} rows)")
        print("pass=1 fail=0")
        return 0
    print(f"  - q_dedup_band_sweep: FAIL\n    got  {got}\n    want {want}")
    print("pass=0 fail=1")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
