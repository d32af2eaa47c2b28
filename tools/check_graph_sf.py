#!/usr/bin/env python3
"""Scale-replay for the dedup graph family (builder-side tooling).

The declared DuckDB oracles for q_dedup_components / q_dedup_cluster_sizes
express connectivity as a recursive transitive closure (`reach(v, l)`),
which materializes O(k^2) label pairs per k-doc component. That is fine at
the sf0.01 gate and at sf1, but clone families compound under the gen_sf
replication (short documents are unchanged by the salt insertion, so their
replicas are exact clones), and at sf3 the closure's quadratic blowup makes
the DuckDB side impractical (>50 min on one query) while the engine's
linear min-label propagation finishes in seconds.

This tool verifies the same semantics at big sf with a linear-time
independent implementation (components, cluster_sizes, and — since
round 11 — survivors, whose oracle embeds the same recursive closure): the candidate-pair prefix (shingle -> 2x md5
minhash -> 2 bands -> df<=1000 cap -> bucket pairs) runs in DuckDB exactly
as the declared oracle writes it, and connectivity is a Python union-find
with min-doc_id representatives — a third implementation, sharing no code
with either the Spark engine or the recursive CTE. Compares cell-for-cell
against the engine dumps.

Usage: check_graph_sf.py <sfDir> <outDir> [cap]
(exit 0 iff both queries match)

The hot-band df cap defaults to 1000 — the value of graft's
`Dedup.MaxPostingDf` (src/main/scala/graft/ops/Dedup.scala), which notes
the coupling on its definition. Pass the cap as argv[3] (or env
GRAFT_MAX_POSTING_DF) if the Scala constant ever changes, so a drift is
a one-flag fix at launch time instead of a failed multi-hour sf3 replay.
The 2-band minhash layout itself is replayed verbatim from the declared
q_dedup_minhash oracle; if THAT layout changes this tool must change
with it (it is an independent third implementation, not a generated one).
"""
import os
import sys

import duckdb

CAND_SQL = """
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
           QUALIFY count(*) OVER (PARTITION BY band_no, band) <= {cap})
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
FROM bands x JOIN bands y
  ON x.band_no = y.band_no AND x.band = y.band AND x.doc_id < y.doc_id
"""


def main(sf_dir: str, out_dir: str, cap: int = 1000) -> int:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    pairs = con.sql(CAND_SQL.format(cap=cap)).fetchall()
    doc_ids = [r[0] for r in con.sql(
        "SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    print(f"candidate pairs: {len(pairs)}, docs: {len(doc_ids)}")

    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while x != root:  # path compression
            nxt = parent[x]
            parent[x] = root
            x = nxt
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-doc_id representative == the oracle's min(l) label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in pairs:
        union(a, b)
    comp = {d: find(d) for d in doc_ids}

    n_fail = 0

    got = con.sql(f"SELECT doc_id, comp FROM "
                  f"read_parquet('{out_dir}/q_dedup_components/*.parquet') "
                  f"ORDER BY doc_id").fetchall()
    want = sorted(comp.items())
    if got == want:
        print(f"  + q_dedup_components: OK ({len(got)} rows)")
    else:
        n_fail += 1
        bad = [(g, w) for g, w in zip(got, want) if g != w][:3]
        print(f"  - q_dedup_components: FAIL rows={len(got)} vs {len(want)},"
              f" first diffs {bad}")

    sizes = {}
    for rep in comp.values():
        sizes[rep] = sizes.get(rep, 0) + 1
    hist = {}
    for sz in sizes.values():
        hist[sz] = hist.get(sz, 0) + 1
    got = con.sql(f"SELECT sz, n_clusters FROM "
                  f"read_parquet('{out_dir}/q_dedup_cluster_sizes/*.parquet')"
                  f" ORDER BY sz").fetchall()
    want = sorted(hist.items())
    if got == want:
        print(f"  + q_dedup_cluster_sizes: OK ({len(got)} rows)")
    else:
        n_fail += 1
        print(f"  - q_dedup_cluster_sizes: FAIL got {got[:5]}... "
              f"want {want[:5]}...")

    # q_dedup_survivors (added round 11): its declared oracle embeds the
    # same recursive closure, so it needs the same union-find stand-in at
    # big sf. Survivor = per component, max token count, ties to min
    # doc_id; singleton docs are their own 1-member component.
    n_tok = dict(con.sql(
        "SELECT doc_id, len(string_split(text, ' ')) FROM documents"
    ).fetchall())
    best = {}  # comp -> (survivor, tokens)
    for d in doc_ids:
        c = comp[d]
        cur = best.get(c)
        if cur is None or (n_tok[d], -d) > (cur[1], -cur[0]):
            best[c] = (d, n_tok[d])
    want = sorted((c, surv, tok, sizes.get(c, 1))
                  for c, (surv, tok) in best.items())
    got = con.sql(f"SELECT comp, survivor, survivor_tokens, sz FROM "
                  f"read_parquet('{out_dir}/q_dedup_survivors/*.parquet') "
                  f"ORDER BY comp").fetchall()
    got = [tuple(r) for r in got]
    if got == want:
        print(f"  + q_dedup_survivors: OK ({len(got)} rows)")
    else:
        n_fail += 1
        bad = [(g, w) for g, w in zip(got, want) if g != w][:3]
        print(f"  - q_dedup_survivors: FAIL rows={len(got)} vs {len(want)},"
              f" first diffs {bad}")

    print(f"pass={3 - n_fail} fail={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    _cap = int(sys.argv[3]) if len(sys.argv) > 3 else int(
        os.environ.get("GRAFT_MAX_POSTING_DF", "1000"))
    sys.exit(main(sys.argv[1], sys.argv[2], _cap))
