"""Generate an sf1-shaped perf fixture by replicating sf0.1 REP times.

Perf-probe tooling only (VERDICT r3 item 8: "one sf1 scale probe of the
most expensive bench queries") — NOT a correctness fixture. The driver's
read-only testdata stops at sf0.1, so scaling behaviour past it must be
measured on a locally synthesized replica set. Replication preserves the
join graph and per-key densities:

- dims (region, nation) copy as-is;
- keyed tables (customer/supplier/part/orders/lineitem/events/documents/
  embeddings) replicate with per-replica key offsets, and FOREIGN keys
  are offset consistently (lineitem.l_orderkey follows orders.o_orderkey,
  orders.o_custkey follows customer.c_custkey, ...) so every join keeps
  its sf0.1 fanout — row counts scale REP x while join selectivity and
  per-key group sizes stay constant, which is what linear scaling of a
  hash join/agg assumes;
- documents.text on copies gets a replica tag token INSERTED EVERY 6
  WORDS ("a b c d e f" -> "r3 a b c d e f r3 ..."): within-replica
  duplicate structure (what dedup operators block on) is preserved
  (both members of a dup pair receive the identical transformation),
  while cross-replica word/char-shingle Jaccard drops well below the
  dedup thresholds — a prefix-only tag was measured to leave replicas
  ~95% shingle-identical, which made every doc a 10-way near-dup and
  grew candidate pairs O(REP^2): an artifact of the replication, not
  the operator;
- embeddings on copies are cyclically ROLLED by i dimensions: norms and
  the marginal distribution are preserved exactly, but a vector and its
  rolled copy decorrelate, so semantic-dedup/ANN candidate structure
  scales like a 10x corpus instead of a corpus of 10-way twins.

Usage: python tools/make_scale.py [REP] [OUT_DIR]
Defaults: REP=10, OUT_DIR=/tmp/spark_graft_scale/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# table -> (primary key col, {fk col: parent table}) ; None pk = copy as-is
PLAN = {
    "region": None,
    "nation": None,
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        "l_orderkey",
        {"l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": ("event_id", {"user_id": None}),  # user_id: own offset space
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}


def _offset(col: pa.ChunkedArray) -> int:
    """Replica stride for a key column: next power-of-10 above max+1 keeps
    offset keys readable when debugging."""
    m = int(pa.compute.max(col).as_py()) + 1
    s = 1
    while s < m:
        s *= 10
    return s


def _parse_overrides(spec: str) -> dict[str, int]:
    """'documents=1000,embeddings=100' -> per-table replica overrides."""
    out = {}
    for pair in spec.split(","):
        if not pair:
            continue
        name, _, n = pair.partition("=")
        if name not in PLAN or PLAN[name] is None:
            raise SystemExit(f"unknown/unreplicable table in spec: {name!r}")
        out[name] = int(n)
    return out


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scale/sf1"
    # Optional per-table replica overrides (round 14, the sf10 probe
    # fixture): each domain scales to where ITS operators are stressed —
    # relational 10x (6M lineitem), ANN 100x (200k embeddings), dedup/
    # text 1000x (5M documents) — without paying a 60M-row relational
    # replica nobody probes. A child table's rep must not exceed its FK
    # parents' (replica i's offset FKs must reference an existing
    # parent replica i).
    overrides = _parse_overrides(sys.argv[3]) if len(sys.argv) > 3 else {}
    for child, plan in PLAN.items():
        if plan is None:
            continue
        crep = overrides.get(child, rep)
        for parent in plan[1].values():
            if parent is None:
                continue
            prep = overrides.get(parent, rep)
            if crep > prep:
                raise SystemExit(
                    f"{child} rep {crep} exceeds FK parent {parent} rep {prep}"
                )
    os.makedirs(out, exist_ok=True)

    strides: dict[str, int] = {}
    # pass 1: strides for every replicated table's pk (fk offsets reuse them)
    for name, plan in PLAN.items():
        if plan is None:
            continue
        pk, _ = plan
        t = pq.read_table(f"{SRC}/{name}.parquet", columns=[pk])
        strides[name] = _offset(t[pk])
    strides["_user"] = None  # filled from events below

    for name, plan in PLAN.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        if plan is None:
            pq.write_table(t, f"{out}/{name}.parquet")
            print(f"{name}: copied {t.num_rows} rows")
            continue
        pk, fks = plan
        if name == "events":
            strides["_user"] = _offset(t["user_id"])
        n_rep = overrides.get(name, rep)
        # incremental writer: a 1000-replica documents table must not
        # hold every replica in memory before the single write_table
        writer = pq.ParquetWriter(f"{out}/{name}.parquet", t.schema)
        written = 0
        for i in range(n_rep):
            cols = {}
            for field in t.schema:
                c = t[field.name]
                if i == 0:
                    cols[field.name] = c
                    continue
                if field.name == pk:
                    cols[field.name] = pa.compute.add(
                        c, i * strides[name]
                    ).cast(field.type)
                elif field.name in fks:
                    parent = fks[field.name]
                    stride = (
                        strides["_user"] if parent is None else strides[parent]
                    )
                    cols[field.name] = pa.compute.add(c, i * stride).cast(
                        field.type
                    )
                elif name == "documents" and field.name == "text":
                    tag = f"r{i}"
                    texts = c.combine_chunks().to_pylist()
                    tagged_texts = []
                    for s in texts:
                        words = (s or "").split(" ")
                        tagged = []
                        for j in range(0, len(words), 6):
                            tagged.append(tag)
                            tagged.extend(words[j : j + 6])
                        tagged_texts.append(" ".join(tagged))
                    cols[field.name] = pa.array(tagged_texts, type=pa.string())
                    cols["__n_chars_override"] = pa.array(
                        [len(s) for s in tagged_texts], type=pa.int64()
                    )
                elif name == "documents" and field.name == "n_chars":
                    # filled from the tagged text below (text precedes
                    # n_chars in the fixture schema)
                    cols[field.name] = None
                elif name == "embeddings" and field.name == "embedding":
                    arr = c.combine_chunks()
                    offs = arr.offsets.to_numpy(zero_copy_only=False)
                    dim = int(offs[1] - offs[0])
                    flat = arr.values.to_numpy(zero_copy_only=False)
                    mat = flat.reshape(-1, dim)
                    rolled = np.roll(mat, i % dim, axis=1)
                    # Past dim replicas the roll CYCLES (replica dim+j
                    # would be an exact vector twin of replica j — a
                    # 100x corpus of k-way twins, not a 100x corpus):
                    # decorrelate each roll cycle q >= 1 with a
                    # deterministic per-cycle sign flip — norms and the
                    # marginal |component| distribution are preserved
                    # exactly, while twins across cycles break.
                    q = i // dim
                    if q:
                        sign = np.where(
                            np.random.default_rng(10_000 + q).random(dim)
                            < 0.5,
                            np.float32(-1.0),
                            np.float32(1.0),
                        )
                        rolled = rolled * sign
                    cols[field.name] = pa.ListArray.from_arrays(
                        arr.offsets, pa.array(rolled.ravel(), type=pa.float32())
                    )
                else:
                    cols[field.name] = c
            if cols.get("n_chars", 0) is None:
                cols["n_chars"] = cols.pop("__n_chars_override").cast(
                    t.schema.field("n_chars").type
                )
            cols.pop("__n_chars_override", None)
            part = pa.table(
                {f.name: cols[f.name] for f in t.schema}, schema=t.schema
            )
            writer.write_table(part, row_group_size=256 * 1024)
            written += part.num_rows
        writer.close()
        print(f"{name}: {t.num_rows} -> {written} rows")


if __name__ == "__main__":
    main()
