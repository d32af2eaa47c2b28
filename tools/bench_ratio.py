#!/usr/bin/env python3
"""Per-query ratio report between two bench artifacts.

Usage: bench_ratio.py SMALL.json BIG.json [--flag=4.0]

Prints every query's seconds in both artifacts and the big/small ratio,
sorted by ratio descending, then a summary (sum of matched entries,
overall ratio, count above the flag threshold). Used for the
sub-linearity series (sf0.1 -> sf1 -> sf3): with 3x the data, any query
growing more than --flag x (default 4.0) needs a named plan explanation
or a fix (VERDICT r12 item 2 done-criterion). Entries at -1 (failed) or
missing on either side are listed separately, never silently dropped.

Reads the full artifact line via json.loads — these files are written
by Bench.scala itself, so unlike the in-engine baseline parser there is
no partial-tail concern here.
"""
import json
import sys


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        return 2
    flag = 4.0
    for a in argv:
        if a.startswith("--flag="):
            flag = float(a.split("=", 1)[1])
        elif a.startswith("--"):
            print(f"unknown option: {a} (expected --flag=N)")
            return 2
    small = json.load(open(args[0]))["queries"]
    big = json.load(open(args[1]))["queries"]
    common = sorted(set(small) & set(big))
    missing = sorted(set(small) ^ set(big))
    rows, skipped = [], []
    for q in common:
        s, b = small[q], big[q]
        if s <= 0 or b <= 0:
            skipped.append((q, s, b))
        else:
            rows.append((b / s, q, s, b))
    rows.sort(reverse=True)
    print(f"{'ratio':>7}  {'query':40} {'small_s':>9} {'big_s':>9}")
    for r, q, s, b in rows:
        mark = " <-- FLAG" if r > flag else ""
        print(f"{r:7.2f}  {q:40} {s:9.3f} {b:9.3f}{mark}")
    for q, s, b in skipped:
        print(f"   skip  {q:40} {s:9.3f} {b:9.3f}  (failed side)")
    for q in missing:
        print(f"   only-one-side  {q}")
    if not rows:
        # ADVICE r13: disjoint artifacts / all-failed entries reach here
        # with an empty match set — report it instead of dividing by zero
        print("matched=0 — no entries with positive times on both sides")
        return 0
    ssum = sum(s for _, _, s, _ in rows)
    bsum = sum(b for _, _, _, b in rows)
    nflag = sum(1 for r, *_ in rows if r > flag)
    print(f"matched={len(rows)} sum {ssum:.1f}s -> {bsum:.1f}s "
          f"overall {bsum / ssum:.2f}x; {nflag} entries above {flag}x")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
