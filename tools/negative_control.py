#!/usr/bin/env python3
"""Negative control for the correctness gate: prove the oracle comparison
is not vacuously green by corrupting exactly one cell of one dumped
query output and checking that local_check flips to FAIL, then restoring
and checking it returns to PASS.

Usage: negative_control.py <sfDir> <outDir> [query | --rotate=N]
(query defaults to q_agg_group). Exit 0 iff the gate flipped AND
recovered; any other outcome — including "still green after
corruption", the worst kind of silent rot — exits 1.

--rotate=N (VERDICT r10 §6): deterministic per-round rotation so the
control's sensitivity is demonstrated across output SHAPES over time,
not re-proven forever on one aggregate. Queries with dumps under
<outDir> are grouped into families by their second name token
(q_agg_*, q_dedup_*, q_window_*, ...); round N picks family
N % n_families (sorted), and within it member (N // n_families) %
size — every family gets its turn, then every member. Prints the pick
and runs the standard flip/restore control on it.
"""
import glob
import os
import shutil
import subprocess
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def run_check(sf_dir: str, out_dir: str, query: str) -> bool:
    env = dict(os.environ, SPARK_GRAFT_ONLY=query)
    res = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "local_check.py"), sf_dir, out_dir],
        env=env, capture_output=True, text=True)
    out = res.stdout + res.stderr
    return "fail=0" in out and f"+ {query}: OK" in out


def main(sf_dir: str, out_dir: str, query: str) -> int:
    files = glob.glob(os.path.join(out_dir, query, "*.parquet"))
    if not files:
        print(f"no dump for {query} under {out_dir}", file=sys.stderr)
        return 1
    target = files[0]
    backup = target + ".nc_backup"
    shutil.copy(target, backup)
    try:
        if not run_check(sf_dir, out_dir, query):
            print(f"PRECONDITION FAILED: {query} not green before "
                  "corruption", file=sys.stderr)
            return 1
        df = duckdb.sql(f"SELECT * FROM read_parquet('{target}')").df()
        # corrupt one cell of the last column (numeric += 1, string gets
        # a suffix) — the smallest possible divergence the gate must see.
        # The cell must be NON-NULL: a null "corrupted" with += 1 becomes
        # NaN, which round-trips to parquet as null again, and the
        # control would report a vacuous gate that is actually fine
        # (found the hard way on q_dedup_semantic, whose last column is
        # null exactly at row 0).
        col, idx = None, None
        for c in reversed(df.columns):
            i = df[c].first_valid_index()
            if i is not None:
                col, idx = c, i
                break
        if col is None:
            print(f"no non-null cell to corrupt in {query}",
                  file=sys.stderr)
            return 1
        if df[col].dtype == bool:
            df.loc[idx, col] = not df.loc[idx, col]
        elif df[col].dtype == object:
            df.loc[idx, col] = str(df.loc[idx, col]) + "_x"
        else:
            df.loc[idx, col] = df.loc[idx, col] + 1
        pq.write_table(pa.Table.from_pandas(df), target)
        if run_check(sf_dir, out_dir, query):
            print("NEGATIVE CONTROL FAILED: gate stayed green after a "
                  "one-cell corruption — the comparison is vacuous",
                  file=sys.stderr)
            return 1
        print(f"gate flipped to FAIL on one corrupted cell of {query}")
    finally:
        shutil.move(backup, target)
    if not run_check(sf_dir, out_dir, query):
        print("RESTORE FAILED: gate still red after restoring the dump",
              file=sys.stderr)
        return 1
    print("gate recovered after restore — negative control PASSED")
    return 0


def pick_rotation(out_dir: str, n: int) -> str:
    """Round-N rotation pick over the dumped queries (see module doc).

    Candidates are restricted to queries present in oracle_sql.json:
    rows-only dumps have no oracle, so run_check's '+ name: OK'
    precondition can never hold for them and a rotation landing there
    would exit 1 spuriously (fail-closed, but it kills the per-round
    control for that N)."""
    import json
    oracled = set(json.load(open(os.path.join(out_dir, "oracle_sql.json"))))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d))
                   and d.startswith("q_") and d in oracled)
    fams = {}
    for name in names:
        fams.setdefault(name.split("_")[1], []).append(name)
    fam_names = sorted(fams)
    fam = fam_names[n % len(fam_names)]
    members = fams[fam]
    return members[(n // len(fam_names)) % len(members)]


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    arg = sys.argv[3] if len(sys.argv) > 3 else "q_agg_group"
    if arg.startswith("--rotate="):
        arg = pick_rotation(sys.argv[2], int(arg.split("=", 1)[1]))
        print(f"rotation pick: {arg}")
    sys.exit(main(sys.argv[1], sys.argv[2], arg))
