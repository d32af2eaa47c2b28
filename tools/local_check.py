#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (t2): run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`. For each query parquet dump,
run the declared DuckDB oracle SQL against the same tables, sort columns by
name, and compare cell-for-cell. Usage: local_check.py <sfDir> <outDir>.

Set SPARK_GRAFT_ONLY=<q1,q2,...> (comma-separated, same contract as
Verify/Bench) to check a subset — negative_control.py relies on this so
each of its three gate invocations replays one query, not the whole
suite (the full replay is ~minutes at sf0.01 and hours at sf1+, where
the control would otherwise be unusable); big-sf replays use it to
resume after a crash.

DuckDB temp spill is capped at 60 GiB: the q_dedup_band_sweep oracle at
sf3 filled a 252 GB device and took the whole replay down with it — a
loud single-query IO error beats a dead machine.

SPARK_GRAFT_HASHCMP_ROWS=N (default 0 = off) switches any query whose
dump has >= N rows to a DuckDB-side order-insensitive multiset-hash
compare: (count, sum(hash(row)), bit_xor(hash(row))) over ALL rows of
both sides, plus a DESCRIBE-level column/type check. This is a full
comparison, not a sample — it exists because the pandas cell loop is
O(rows) in *Python* (q_scalar_date at sf10: 555 s of compare for a
query whose oracle runs in seconds) while the hash compare stays inside
DuckDB's vectorized engine. The sf0.01 driver-gate path is unchanged
(env unset); big-sf replays set a threshold (e.g. 1000000). Hash-mode
passes print OK-HASH so the artifact says which mode certified what.
One semantic delta, deliberately stricter: the pandas path equates
NaN with NULL (norm()); the hash path does not — a NaN/NULL drift
between engines fails loudly here and should be chased, not masked.
"""
import json
import re
import sys
import glob
import os
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.sql("SET max_temp_directory_size='60GiB'")
    # Match Spark's null ordering (ASC => NULLS FIRST, DESC => NULLS
    # LAST; DuckDB defaults to NULLS LAST on ASC): the order gate ranks
    # the SPARK dump with DuckDB's rank(), so a nullable sort key with no
    # explicit NULLS directive would otherwise fail falsely (ADVICE r17).
    con.sql("SET default_null_order='nulls_first_on_asc_last_on_desc'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    only = os.environ.get("SPARK_GRAFT_ONLY")
    only_set = set(only.split(",")) if only else None
    hash_rows = int(os.environ.get("SPARK_GRAFT_HASHCMP_ROWS", "0"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir) or (only_set and name not in only_set):
            continue
        t0 = time.time()
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        n_got = con.sql(
            f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows-only), rows={n_got}")
            timing(name, t0)
            continue
        if hash_rows and n_got >= hash_rows:
            if hash_compare(con, name, files, oracle[name], n_got):
                n_pass += 1
            else:
                n_fail += 1
            timing(name, t0)
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        got = got[sorted(got.columns)]
        want = con.sql(oracle[name]).df()
        want = want[sorted(want.columns)]
        ok = True
        msgs = []
        if list(got.columns) != list(want.columns):
            ok = False
            msgs.append(f"cols {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            ok = False
            msgs.append(f"rows {len(got)} != {len(want)}")
        else:
            # dtype-strict: the driver's hash gate is sensitive to the
            # physical type (e.g. DuckDB widens integer sum() to HUGEINT
            # while Spark emits BIGINT — values equal, hashes differ), so
            # a dtype mismatch must fail locally too.
            for c in got.columns:
                da, db = str(got[c].dtype), str(want[c].dtype)
                if da != db:
                    ok = False
                    msgs.append(f"col {c}: dtype {da} != {db}")
            if not ok:
                n_fail += 1
                print(f"  - {name}: FAIL  " + "; ".join(msgs))
                timing(name, t0)
                continue
            for c in got.columns:
                a, b = got[c], want[c]
                try:
                    import pandas as pd
                    eq = a.reset_index(drop=True).astype(object).where(
                        pd.notna(a.reset_index(drop=True)), None) \
                        .combine(b.reset_index(drop=True).astype(object).where(
                            pd.notna(b.reset_index(drop=True)), None),
                        lambda x, y: norm(x) == norm(y))
                except Exception as e:
                    ok = False
                    msgs.append(f"col {c}: compare error {e}")
                    continue
                bad = [i for i, v in eq.items() if not v]
                if bad:
                    ok = False
                    i = bad[0]
                    msgs.append(
                        f"col {c}: {len(bad)} diffs, first row {i}: "
                        f"{got[c].iloc[i]!r} != {want[c].iloc[i]!r}")
        if ok:
            n_pass += 1
            print(f"  + {name}: OK ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"  - {name}: FAIL  " + "; ".join(msgs))
        timing(name, t0)
    missing = set(oracle) - {d for d in os.listdir(out_dir)
                             if os.path.isdir(os.path.join(out_dir, d))}
    if only_set is not None:
        # restrict the missing-dump check to the filter itself — but with
        # the PARSED set, not the raw comma-joined string (a multi-query
        # filter intersected with the raw string is always empty → a
        # declared-but-undumped query in the filter would silently pass).
        missing &= only_set
    if missing:
        print(f"  ! oracle declared but no dump: {sorted(missing)}")
    print(f"pass={n_pass} fail={n_fail}")
    return 1 if n_fail or missing else 0


def hash_compare(con, name, files, sql, n_got) -> bool:
    """All-rows order-insensitive compare inside DuckDB: column names +
    declared types (DESCRIBE), then (count, sum, xor) of the per-row
    hash over name-sorted columns, then — when the oracle SQL declares a
    top-level ORDER BY — a sortedness check of those keys over the
    dump's natural order (ADVICE r16: the multiset hash alone would
    pass a row-ordering regression that the small-sf pandas path, which
    compares positionally, would catch — and hash mode engages exactly
    at the scales where multi-partition range sorts can misbehave).
    Returns pass/fail and prints the verdict with an explicit OK-HASH
    marker — never a silent subset."""
    con.sql(f"CREATE OR REPLACE TEMP VIEW got_v AS "
            f"SELECT * FROM read_parquet({files!r})")
    con.sql(f"CREATE OR REPLACE TEMP TABLE want_t AS {sql}")
    gd = {r[0]: r[1] for r in con.sql("DESCRIBE got_v").fetchall()}
    wd = {r[0]: r[1] for r in con.sql("DESCRIBE want_t").fetchall()}
    if sorted(gd) != sorted(wd):
        print(f"  - {name}: FAIL  cols {sorted(gd)} != {sorted(wd)}")
        return False
    bad_t = [c for c in gd if gd[c] != wd[c]]
    if bad_t:
        print(f"  - {name}: FAIL  " + "; ".join(
            f"col {c}: type {gd[c]} != {wd[c]}" for c in bad_t))
        return False
    h = "hash(" + ", ".join(f'"{c}"' for c in sorted(gd)) + ")"
    agg = f"SELECT count(*), sum({h}), bit_xor({h}) FROM "
    g = con.sql(agg + "got_v").fetchone()
    w = con.sql(agg + "want_t").fetchone()
    if g != w:
        con.sql("DROP TABLE want_t")
        which = ("rows" if g[0] != w[0] else "multiset hash")
        print(f"  - {name}: FAIL  {which} {g} != {w}")
        return False
    order_note = order_check(con, name, files, sql, list(wd), set(gd))
    con.sql("DROP TABLE want_t")
    if order_note is False:
        return False
    print(f"  + {name}: OK-HASH ({n_got} rows, all-rows multiset hash"
          f"{order_note})")
    return True


def extract_order_by(sql: str):
    """Return the text of the LAST paren-depth-0 ORDER BY clause of
    `sql` (sans any trailing depth-0 LIMIT/OFFSET), or None if the
    query declares no top-level ordering. Depth tracking keeps ORDER BY
    inside subqueries / window OVER(...) clauses from matching."""
    # word-bounded, any-whitespace lexing (ADVICE r17: a literal
    # single-space scan silently classified 'ORDER\n  BY' as unordered,
    # quietly skipping the order check) — the regex finds candidates,
    # the depth loop decides which are top-level
    ob = {m.start(): m.end()
          for m in re.finditer(r"\bORDER\s+BY\b", sql, re.I)}
    depth, last = 0, -1
    for i, c in enumerate(sql):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and i in ob:
            last = i
    if last < 0:
        return None
    clause, depth = sql[ob[last]:], 0
    lim = {m.start() for m in re.finditer(r"\b(LIMIT|OFFSET)\b",
                                          clause, re.I)}
    for i, c in enumerate(clause):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and i in lim:
            clause = clause[:i]
            break
    return clause.strip()


def order_check(con, name, files, sql, want_cols, got_cols):
    """Verify the dump's natural row order (name-sorted part files ×
    in-file position — Spark's partition order) is sorted by the oracle
    SQL's declared ORDER BY keys. Tie rows are legitimately
    interchangeable (the multiset hash already pinned the row set), so
    the check is rank-monotonicity, not positional equality: rank() by
    the declared keys must be non-decreasing in natural order.

    Returns a suffix string for the OK line (\"\" when no order was
    declared, \" + order\" on success, \" (order check skipped: ...)\"
    when the clause can't be evaluated against the dump), or False on a
    genuine order violation."""
    clause = extract_order_by(sql)
    if clause is None:
        return ""
    keys = []
    for raw in split_depth0(clause, ","):
        key = raw.strip()
        m = re.match(r"^(\d+)(\s+.*)?$", key)
        if m:
            # positional key: resolve against the oracle's SELECT-list
            # order (inside OVER(...) a bare integer would mean the
            # constant, silently making every row a tie)
            pos = int(m.group(1))
            if not 1 <= pos <= len(want_cols):
                return f" (order check skipped: position {pos} oob)"
            key = '"' + want_cols[pos - 1] + '"' + (m.group(2) or "")
        else:
            # strip a source-alias qualifier (l.event_id → event_id):
            # the dump is a single relation, the alias doesn't exist
            m = re.match(r"^(\w+)\.(\w+)(\s+.*)?$", key)
            if m and m.group(2) in got_cols:
                key = '"' + m.group(2) + '"' + (m.group(3) or "")
        keys.append(key)
    seq = (f"read_parquet({sorted(files)!r}, "
           f"filename=true, file_row_number=true)")
    probe = (
        "WITH g AS (SELECT rank() OVER (ORDER BY " + ", ".join(keys) +
        ") AS _rk, row_number() OVER (ORDER BY filename, "
        "file_row_number) AS _rn FROM " + seq + ") "
        "SELECT count(*) FROM (SELECT _rk - lag(_rk) OVER "
        "(ORDER BY _rn) AS _d FROM g) WHERE _d < 0")
    try:
        bad = con.sql(probe).fetchone()[0]
    except Exception as e:
        # a key the dump can't bind (expression over pre-projection
        # columns) — note it loudly rather than fail falsely or skip
        # silently
        return f" (order check skipped: {type(e).__name__}: {e})"
    if bad:
        print(f"  - {name}: FAIL  order: {bad} adjacent natural-order "
              f"row pairs violate ORDER BY {clause}")
        return False
    return " + order"


def split_depth0(s: str, sep: str):
    """Split `s` on `sep` occurrences at paren-depth 0."""
    parts, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def timing(name: str, t0: float) -> None:
    """Per-query oracle+compare seconds: big-sf replays need the cost
    attribution (sf_delta/SCALE.md exclusion bounds read these) — printed
    unconditionally, including on rows-only and dtype-FAIL early exits."""
    print(f"    ({name}: {time.time() - t0:.0f}s)", flush=True)


def norm(v):
    """Normalize a cell for comparison across engines."""
    import datetime
    import numpy as np
    if v is None:
        return None
    if isinstance(v, float) and np.isnan(v):
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if hasattr(v, "to_pydatetime"):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
