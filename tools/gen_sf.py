#!/usr/bin/env python3
"""Local scale-factor amplifier (builder-side tooling, like local_check).

Generates a larger scale factor from an existing driver-generated one by
replicating every table R times with FK-consistent key offsets, so the
oracle gate and bench can run at 10x bench scale without touching the
read-only /root/testdata. Usage:

    gen_sf.py <srcDir> <dstDir> [replicas=10]

Design notes (what keeps the workload shape honest at 10x):
  - Key domains are offset per replica by (domain max + 1), so foreign
    keys stay consistent within a replica and never collide across
    replicas. documents/embeddings share one id domain (they join on
    doc_id = vec_id), so both offset by the same constant.
  - Document texts get a replica-specific salt token inserted every 5
    tokens (replica 0 unchanged) so cross-replica copies are not EXACT
    clones. Measured caveat (r13/r14): the salting dilutes but does not
    eliminate cross-replica similarity — enough shingles/fingerprints
    between salt insertions survive that absolute-threshold families
    (winnow >= 10 shared fps) and banded MinHash still pair replicas of
    the same document, so candidate-pair counts grow ~C(R,2) per doc
    family, super-linear in R (sf1->sf3: 7.3x pairs for 3x docs;
    sf3->sf10: ~11x predicted by C(100,2)/C(30,2), confirmed by the
    winnow probe's 10.7x runtime). Treat big-R fixtures as a
    deliberately clone-dense stress regime — per-pair engine cost is
    what must stay flat, not pair counts. n_chars is recomputed.
  - Embeddings get a tiny alternating-sign per-dim offset scaled by the
    replica index: cross-replica vectors are near but not identical, and
    the perturbation is additive (NOT a scale factor, which cosine would
    be blind to). float32 end-to-end.
  - Everything is deterministic: no RNG anywhere.
  - Each table is written as a single parquet file (DuckDB's gate views
    read '<dir>/<table>.parquet' as a file), parquet 2.6 so the events
    table keeps its TIMESTAMP(NANOS) physical type.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key columns per table, grouped by shared domain
DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event": [("events", "event_id")],
    "user": [("events", "user_id")],
    # documents and embeddings share the id space (doc_id = vec_id joins)
    "doc": [("documents", "doc_id"), ("embeddings", "vec_id")],
}
COPY_AS_IS = ["region", "nation"]
REPLICATED = ["customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"]


def salt_text(text: str, r: int) -> str:
    toks = text.split(" ")
    salt = f"g{r}x"
    out = []
    for i, t in enumerate(toks):
        if i > 0 and i % 5 == 0:
            out.append(salt)
        out.append(t)
    return " ".join(out)


def main(src: str, dst: str, replicas: int) -> int:
    os.makedirs(dst, exist_ok=True)
    tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in REPLICATED}
    # per-domain offset constant = domain max + 1
    k = {}
    for dom, cols in DOMAINS.items():
        k[dom] = 1 + max(
            pc.max(tables[t].column(c)).as_py() for t, c in cols)
    key_of = {(t, c): dom for dom, cols in DOMAINS.items() for t, c in cols}

    for t in COPY_AS_IS:
        tab = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tab, f"{dst}/{t}.parquet", version="2.6")
        print(f"{t}: copied {tab.num_rows} rows")

    for t in REPLICATED:
        base = tables[t]
        out = []
        for r in range(replicas):
            tab = base
            for ci, name in enumerate(tab.schema.names):
                dom = key_of.get((t, name))
                if dom is not None and r > 0:
                    col = pc.add(tab.column(name), pa.scalar(
                        r * k[dom], type=tab.schema.field(name).type))
                    tab = tab.set_column(ci, tab.schema.field(name), col)
            if t == "documents" and r > 0:
                texts = [salt_text(x, r) for x in
                         tab.column("text").to_pylist()]
                tab = tab.set_column(
                    tab.schema.names.index("text"),
                    tab.schema.field("text"), pa.array(texts, pa.string()))
                tab = tab.set_column(
                    tab.schema.names.index("n_chars"),
                    tab.schema.field("n_chars"),
                    pa.array([len(x) for x in texts], pa.int64()))
            if t == "embeddings" and r > 0:
                embs = tab.column("embedding").combine_chunks()
                flat = embs.flatten().to_numpy(zero_copy_only=False)
                dim = len(flat) // tab.num_rows
                pattern = np.where(np.arange(dim) % 2 == 0, 1.0, -1.0)
                pert = (flat.reshape(-1, dim) +
                        np.float32(r * 5e-4) * pattern.astype(np.float32))
                col = pa.FixedSizeListArray.from_arrays(
                    pa.array(pert.astype(np.float32).ravel(), pa.float32()),
                    dim).cast(tab.schema.field("embedding").type)
                tab = tab.set_column(
                    tab.schema.names.index("embedding"),
                    tab.schema.field("embedding"), col)
            out.append(tab)
        merged = pa.concat_tables(out)
        pq.write_table(merged, f"{dst}/{t}.parquet", version="2.6")
        print(f"{t}: {base.num_rows} -> {merged.num_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 10))
