#!/usr/bin/env python3
"""Standalone ORDER BY sortedness audit over an existing Verify dump
directory — the oracle-free half of local_check's hash-mode order check
(ADVICE r16). For every dump whose declared oracle SQL carries a
top-level ORDER BY, verify the dump's natural row order (name-sorted
part files x in-file position — Spark's partition order) is sorted by
those keys, via the same rank-monotonicity probe local_check uses.

Why it exists separately: the hash-mode order check runs only when the
oracle is (re-)executed, which at sf10 costs hours for the two
throughput-bound oracles. Row ORDER is a property of the dump alone, so
this audit certifies it retroactively over already-parity-checked dumps
at scan cost — minutes for the full 164-query sf10 surface. Positional
keys (ORDER BY 1) are resolved against the oracle's SELECT list via
`DESCRIBE <sql>`, which binds/plans without executing.

Usage: order_audit.py <sfDir> <outDir>
(sfDir only feeds the table views DESCRIBE needs for positional keys.)
"""
import json
import os
import sys
import glob
import time

import duckdb

import local_check


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # Spark's null ordering, same rationale as local_check.main
    con.sql("SET default_null_order='nulls_first_on_asc_last_on_desc'")
    for t in local_check.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    only = os.environ.get("SPARK_GRAFT_ONLY")
    only_set = set(only.split(",")) if only else None
    n_ok = n_fail = n_skip = n_unordered = 0
    t_start = time.time()
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir) or (only_set and name not in only_set):
            continue
        if name not in oracle:
            continue
        sql = oracle[name]
        if local_check.extract_order_by(sql) is None:
            n_unordered += 1
            print(f"  ~ {name}: no top-level ORDER BY declared")
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        # SELECT-list column order without executing the oracle —
        # positional keys (ORDER BY 1) resolve against this
        want_cols = [r[0] for r in con.sql(f"DESCRIBE {sql}").fetchall()]
        got_cols = {r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
        t0 = time.time()
        note = local_check.order_check(
            con, name, files, sql, want_cols, got_cols)
        dt = time.time() - t0
        if note is False:
            n_fail += 1  # order_check already printed the FAIL line
        elif note == " + order":
            n_ok += 1
            print(f"  + {name}: ORDER OK ({dt:.0f}s)")
        else:
            n_skip += 1
            print(f"  ~ {name}:{note}")
    print(f"ORDER TOTAL ok={n_ok} fail={n_fail} skipped={n_skip} "
          f"unordered={n_unordered} elapsed={time.time() - t_start:.0f}s")
    print("ORDER_AUDIT_DONE")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
