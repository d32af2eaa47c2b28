#!/usr/bin/env python3
"""Cross-sf row-count-delta cap detector (builder-side tooling).

Round 10 found BOTH of its real scale defects by hand-comparing per-query
row counts between the sf1 and sf3 replay logs (SCALE.md round-10): a
count that goes to ZERO at the bigger sf (q_dedup_embedding_lsh 10 -> 0:
SRP band saturation — every bucket over the df-cap, all dropped) and a
count that goes CONSTANT while the corpus scales (q_dedup_embedding
24190 -> 24190: every label block at MaxEmbeddingBlock) are the two
signatures of a cap quietly dominating an operator's output while the
oracle gate stays green (the oracle replays the same cap, so a
structurally-empty result still hash-matches). This tool mechanizes that
comparison so the next such defect is a CI-style flag, not a lucky
eyeball.

Usage:
    sf_delta.py <small_check.log> <big_check.log>
                [--allow=q_a,q_b] [--min-const-rows=N]

Inputs are two `tools/local_check.py` logs (any two scale factors, small
first). Lines parsed:
    + q_name: OK (N rows)
    ~ q_name: no oracle (rows-only), rows=N
    - q_name: FAIL ...          (counted as a failure, always flagged)

Flags, each printed with both counts:
  ZERO   small > 0 and big == 0 — the saturation signature. Always
         suspicious: an operator that finds things at sf_k and nothing
         at sf_3k is almost never reflecting the data.
  CONST  small == big and small >= --min-const-rows (default 100) — the
         block-cap signature. Small equal counts are usually legitimate
         fixed-shape outputs (group-bys over enum columns, top-k LIMITs,
         sweep configs), hence the threshold; a large equal count on a
         corpus-scaling operator means something stopped growing.
  FAIL   the query failed outright in the big log.

--allow= names queries whose flag is explained and accepted (e.g. a
census-carrying operator whose pair count is legitimately cap-bounded at
both scales, documented in SCALE.md). Allowed flags are printed but do
not affect the exit code.

Durable triage (VERDICT r11 §6): tools/sf_delta_allow.json — a
{query: reason} annotations file next to this script — is loaded
automatically and merged into --allow, with each allowed flag printing
its recorded reason. Triaged-benign flags therefore stay triaged across
rounds: a run reports (and exits nonzero on) only NEW flags. Override
the file path with --allow-file=PATH; --allow-file= (empty) disables it.

Exit 0 iff no un-allowed flags — wire it after each big-sf replay so a
new zero-crossing or constant fails the run loudly.

Self-test: pointed at the committed pre-fix round-10 logs
(localdata/sf1_full_check.log vs localdata/sf3_check.log) this tool
re-detects exactly the two r10 defects:
    ZERO  q_dedup_embedding_lsh  10 -> 0
    CONST q_dedup_embedding      24190 -> 24190
"""
import json
import os
import re
import sys

LINE = re.compile(
    r"^\s*([+~-])\s+(q_\w+):\s+(?:OK \((\d+) rows\)"
    r"|no oracle \(rows-only\), rows=(\d+)"
    r"|FAIL)")


def parse(path):
    """-> ({name: rows}, {failed names})."""
    rows, failed = {}, set()
    with open(path) as f:
        for line in f:
            m = LINE.match(line)
            if not m:
                continue
            mark, name, ok_rows, ro_rows = m.groups()
            if mark == "-":
                failed.add(name)
            else:
                rows[name] = int(ok_rows if ok_rows is not None else ro_rows)
    return rows, failed


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        return 2
    allow = set()
    min_const = 100
    allow_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "sf_delta_allow.json")
    # exact-match flags only (ADVICE r12: prefix matching let a bare
    # `--allow-file` silently DISABLE the default allow file, and any
    # unknown `--allow*` spelling silently became an allow list — a typo
    # could flip the exit semantics); anything unrecognized errors out
    for a in argv:
        if not a.startswith("--"):
            continue
        if a.startswith("--allow-file="):
            allow_file = a.split("=", 1)[1]
        elif a.startswith("--allow="):
            allow |= set(a.split("=", 1)[1].split(","))
        elif a.startswith("--min-const-rows="):
            min_const = int(a.split("=", 1)[1])
        else:
            print(f"unknown option: {a} (expected --allow=Q1,Q2 | "
                  f"--allow-file=PATH | --min-const-rows=N)")
            return 2
    reasons = {}
    if allow_file and os.path.exists(allow_file):
        reasons = {k: v for k, v in json.load(open(allow_file)).items()
                   if k.startswith("q_")}
        allow |= set(reasons)
    small, small_fail = parse(args[0])
    big, big_fail = parse(args[1])
    common = sorted(set(small) & set(big))
    if not common and not big_fail:
        print(f"no common queries between {args[0]} and {args[1]}")
        return 2

    flags = []  # (kind, name, small, big)
    for name in common:
        s, b = small[name], big[name]
        if s > 0 and b == 0:
            flags.append(("ZERO", name, s, b))
        elif s == b and s >= min_const:
            flags.append(("CONST", name, s, b))
    for name in sorted(big_fail):
        flags.append(("FAIL", name, small.get(name, -1), -1))

    print(f"compared {len(common)} queries "
          f"({args[0]} -> {args[1]}), min_const_rows={min_const}")
    for name in common:
        s, b = small[name], big[name]
        ratio = f"{b / s:7.2f}x" if s else "      -"
        print(f"    {name:36s} {s:>10d} -> {b:>10d}  {ratio}")
    new = [f for f in flags if f[1] not in allow]
    for kind, name, s, b in flags:
        tag = "allowed" if name in allow else "NEW"
        why = f"  ({reasons[name]})" if name in reasons else ""
        print(f"  ! {kind:5s} {name}: {s} -> {b}  [{tag}]{why}")
    print(f"flags={len(flags)} new={len(new)}")
    return 1 if new else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
