#!/usr/bin/env python3
"""Scale-replay for q_dedup_minhash_quality (builder-side tooling).

Same defect and same fix as tools/check_bandsweep_sf.py: the declared
oracle's `inter` CTE computes shingle intersections over EVERY corpus
pair sharing a shingle (a global posting self-join), which spills
unboundedly at big sf, while the query's own `scored` step only ever
reads `inter` rows for the minhash CANDIDATE pairs. This replay keeps
the declared minhash candidate CTE verbatim (2x md5 signature, 2x4
banding, df<=1000 cap — the same prefix check_graph_sf.py certifies)
and computes the true intersection per candidate pair via an integer
shingle dictionary (8-byte sids through the exploded join instead of
~60-byte strings): identical output at a fraction of the spill.

Usage: check_minhash_quality_sf.py <sfDir> <outDir>  (exit 0 iff match)
Compares cell-for-cell against the engine dump (a, b, n_match, n_inter,
n_union ordered by a, b).
"""
import sys

import duckdb

QUALITY_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
 sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
          range(1, greatest(len(tk) - 1, 1) + 1),
          i -> array_to_string(tk[i:i+1], ' '))) AS sh FROM toks),
 hx AS (SELECT doc_id, md5('0:' || sh) AS m0, md5('1:' || sh) AS m1 FROM sh),
 mh AS (SELECT doc_id,
          min(substring(m0, 1, 8))  AS h0, min(substring(m0, 9, 8))  AS h1,
          min(substring(m0, 17, 8)) AS h2, min(substring(m0, 25, 8)) AS h3,
          min(substring(m1, 1, 8))  AS h4, min(substring(m1, 9, 8))  AS h5,
          min(substring(m1, 17, 8)) AS h6, min(substring(m1, 25, 8)) AS h7
        FROM hx GROUP BY doc_id),
 bands_all AS (
   SELECT doc_id, 0 AS band_no, h0 || h1 || h2 || h3 AS band FROM mh
   UNION ALL
   SELECT doc_id, 1 AS band_no, h4 || h5 || h6 || h7 AS band FROM mh),
 bands AS (SELECT doc_id, band_no, band FROM bands_all
           QUALIFY count(*) OVER (PARTITION BY band_no, band) <= 1000),
 cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bands x JOIN bands y
            ON x.band_no = y.band_no AND x.band = y.band
           AND x.doc_id < y.doc_id),
 sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
 -- exact intersection counts via an INTEGER shingle dictionary: string
 -- shingles (~60 B) riding a multi-million-pair join intermediate are
 -- what spilled past the disk in both failed spellings (global join,
 -- then list_intersect whose per-pair list payloads are worse); an
 -- 8-byte sid cuts the exploded intermediate ~8x and stays exact
 dict AS (SELECT sh, row_number() OVER (ORDER BY sh) AS sid
          FROM (SELECT DISTINCT sh FROM sh)),
 shi AS (SELECT s.doc_id, d.sid FROM sh s JOIN dict d USING (sh)),
 inter AS (SELECT c.a, c.b, count(*) AS n_inter
           FROM cand c
           JOIN shi x ON x.doc_id = c.a
           JOIN shi y ON y.doc_id = c.b AND y.sid = x.sid
           GROUP BY 1, 2)
SELECT c.a, c.b,
  CAST(
    (CASE WHEN m1.h0 = m2.h0 THEN 1 ELSE 0 END) +
    (CASE WHEN m1.h1 = m2.h1 THEN 1 ELSE 0 END) +
    (CASE WHEN m1.h2 = m2.h2 THEN 1 ELSE 0 END) +
    (CASE WHEN m1.h3 = m2.h3 THEN 1 ELSE 0 END) +
    (CASE WHEN m1.h4 = m2.h4 THEN 1 ELSE 0 END) +
    (CASE WHEN m1.h5 = m2.h5 THEN 1 ELSE 0 END) +
    (CASE WHEN m1.h6 = m2.h6 THEN 1 ELSE 0 END) +
    (CASE WHEN m1.h7 = m2.h7 THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
  CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
  CAST(sa.nsh + sb.nsh - coalesce(i.n_inter, 0) AS BIGINT) AS n_union
FROM cand c
JOIN mh m1 ON m1.doc_id = c.a
JOIN mh m2 ON m2.doc_id = c.b
JOIN sizes sa ON sa.doc_id = c.a
JOIN sizes sb ON sb.doc_id = c.b
LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
ORDER BY c.a, c.b
"""


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.sql("SET max_temp_directory_size='70GiB'")
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    # materialize the replay ONCE — an EXCEPT against a CTE evaluates
    # the whole pipeline per branch, doubling the spill
    con.sql(f"CREATE TEMP TABLE want AS {QUALITY_SQL}")
    n_diff = con.sql(f"""
        WITH got AS (SELECT * FROM read_parquet(
               '{out_dir}/q_dedup_minhash_quality/*.parquet'))
        SELECT (SELECT count(*) FROM (
                  SELECT * FROM got EXCEPT SELECT * FROM want)) +
               (SELECT count(*) FROM (
                  SELECT * FROM want EXCEPT SELECT * FROM got)) +
               abs((SELECT count(*) FROM got) -
                   (SELECT count(*) FROM want))
    """).fetchone()[0]
    n = con.sql(f"SELECT count(*) FROM read_parquet("
                f"'{out_dir}/q_dedup_minhash_quality/*.parquet')"
                ).fetchone()[0]
    if n_diff == 0:
        print(f"  + q_dedup_minhash_quality: OK ({n} rows)")
        print("pass=1 fail=0")
        return 0
    print(f"  - q_dedup_minhash_quality: FAIL ({n_diff} differing rows)")
    print("pass=0 fail=1")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
