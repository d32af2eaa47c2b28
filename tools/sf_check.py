#!/usr/bin/env python3
"""Big-sf full-surface oracle sweep: run local_check.py once per dumped
query under a per-query watchdog, concatenating the per-query verdict
lines into one log with a final tally and a CHECK_DONE stamp.

This institutionalizes the ad-hoc shell loop the r15 sf10 parity run
used (SCALE.md r15: a wedged DuckDB oracle must become an explicit
TIMEOUT line, never a lost session or a silent subset). One process per
query also isolates DuckDB's temp-spill state: a query that trips the
60 GiB cap fails alone.

Per-query budgets: DEFAULT_BUDGET seconds unless overridden in BUDGETS.
The two overrides are MEASURED completions on this host (r16, solo on a
quiet machine): q_dedup_editdist's oracle is levenshtein-throughput-
bound (5.23M candidate pairs x ~347x347 DP — the same work the engine
spreads across 32 threads in 443 s) and q_text_winnow_pairs completed
in 1271 s (177M-row window cumsum + 1.2G-row pair aggregation). Slow
is not infeasible: both carry explicit budgets instead of TIMEOUT
carve-outs. Queries are run SEQUENTIALLY on purpose — the r16 probes
showed two concurrent big-sf oracles go disk-bound and each runs
slower than both in sequence.

Usage: sf_check.py <sfDir> <outDir> [logPath]
Env: SPARK_GRAFT_HASHCMP_ROWS passes through (recommended: 1000000 —
the pandas cell loop costs ~555 s on a 60M-row dump); SPARK_GRAFT_ONLY
restricts the sweep.
"""
import json
import os
import subprocess
import sys
import time

DEFAULT_BUDGET = 600
BUDGETS = {
    "q_dedup_editdist": 7200,
    "q_text_winnow_pairs": 2400,
}


def main(sf_dir: str, out_dir: str, log_path: str | None) -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    check = os.path.join(here, "local_check.py")
    only = os.environ.get("SPARK_GRAFT_ONLY")
    only_set = set(only.split(",")) if only else None
    dumped = {d for d in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, d))}
    names = sorted(d for d in dumped
                   if only_set is None or d in only_set)
    # Oracle-declared queries whose dump never materialized (ADVICE
    # r16): the sweep enumerates dump DIRECTORIES, and the per-query
    # SPARK_GRAFT_ONLY it sets neutralizes local_check's own
    # missing-dump check — so an undumped oracle query would silently
    # vanish from the tally. Diff the declared set against the dump
    # dirs here and count each gap as a failure.
    try:
        declared = set(json.load(
            open(os.path.join(out_dir, "oracle_sql.json"))))
    except (OSError, ValueError) as e:
        print(f"cannot read oracle_sql.json: {e}", file=sys.stderr)
        return 1
    undumped = sorted(d for d in declared - dumped
                      if only_set is None or d in only_set)
    log = open(log_path, "w") if log_path else sys.stdout

    def emit(line: str) -> None:
        log.write(line + "\n")
        log.flush()
        if log is not sys.stdout:
            print(line, flush=True)

    n_ok = n_fail = n_timeout = 0
    t_start = time.time()
    for name in names:
        budget = BUDGETS.get(name, DEFAULT_BUDGET)
        env = dict(os.environ, SPARK_GRAFT_ONLY=name)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, check, sf_dir, out_dir],
                env=env, capture_output=True, text=True, timeout=budget)
            for line in r.stdout.splitlines():
                emit(line)
            if "fail=0" in r.stdout and r.returncode == 0:
                n_ok += 1
            else:
                n_fail += 1
                # a crashed local_check (nonzero rc, no verdict lines)
                # must leave a diagnostic in the artifact, not a bare
                # fail line (ADVICE r16)
                if r.returncode != 0 and r.stderr:
                    for line in r.stderr.splitlines()[-8:]:
                        emit(f"    stderr| {line}")
        except subprocess.TimeoutExpired as e:
            n_timeout += 1
            emit(f"  ! {name}: DUCKDB TIMEOUT (>{budget}s)")
            # partial output rides on the exception — the last verdict
            # lines say WHICH phase (oracle vs compare) wedged
            for s, tag in ((e.stdout, "stdout"), (e.stderr, "stderr")):
                if s:
                    txt = s.decode(errors="replace") if isinstance(
                        s, bytes) else s
                    for line in txt.splitlines()[-8:]:
                        emit(f"    {tag}| {line}")
            emit(f"    ({name}: {time.time() - t0:.0f}s)")
    for name in undumped:
        n_fail += 1
        emit(f"  ! {name}: MISSING — oracle declared but no dump dir")
    emit(f"TOTAL ok={n_ok} fail={n_fail} timeout={n_timeout} "
         f"elapsed={time.time() - t_start:.0f}s")
    emit("CHECK_DONE")
    return 1 if n_fail or n_timeout else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
