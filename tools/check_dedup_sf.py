#!/usr/bin/env python3
"""Big-sf replay for the five dedup/graph queries whose round-10/11
declared oracles were structurally infeasible at sf3 (global posting
self-joins, quadratic recursive closures).

Since round 12 the DECLARED oracles carry the feasible spellings
themselves — integer shingle dictionary + candidate-restricted
intersection behind MATERIALIZED CTEs (Dedup.candInterSqlCte), and
linear min-label propagation in the recursive term (Graph.scala) —
measured at sf3: band_sweep 64 s, minhash_quality 41 s, graph family
~22 s each, all through the standard gate path. The former standalone
third implementations (check_bandsweep_sf.py, check_minhash_quality_sf
.py, check_graph_sf.py) are retired: one declared spelling, no drift
surface (VERDICT r11 §2).

This wrapper just replays those five declared oracles via local_check.

Usage: check_dedup_sf.py <sfDir> <outDir>   (exit 0 iff all five match)
"""
import os
import subprocess
import sys

QUERIES = ("q_dedup_band_sweep,q_dedup_minhash_quality,q_dedup_components,"
           "q_dedup_cluster_sizes,q_dedup_survivors")

if __name__ == "__main__":
    env = dict(os.environ, SPARK_GRAFT_ONLY=QUERIES)
    sys.exit(subprocess.call(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "local_check.py"),
         sys.argv[1], sys.argv[2]], env=env))
