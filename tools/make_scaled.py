#!/usr/bin/env python3
"""Replica-scale a driver sf directory (builder-side tooling, like
check_oracle.py): N key-shifted copies of every table, written as single
parquet files so the scaled dir is a drop-in SPARK_GRAFT_SF_DIR / oracle
source. Schema-preserving (pyarrow — events.ts keeps the source store's
physical timestamp type; the engine normalizes either form to LONG ns at
scan, see Tables.normalizeTs).

Replication rules (the round-2 "8x key-shifted copies" methodology,
extended so DUPLICATE STRUCTURE scales linearly instead of quadratically
— a replicated corpus where every replica is a near-dup of its original
measures pair-output blowup, not engine scaling):
  - relational tables: FK-consistent key shifts (stride 10M per replica);
    region/nation dims copied once;
  - documents: doc_id shift + per-replica WORD SALT (every word of
    replica k gets suffix "r<k>"), so replicas share no shingles — the
    near-dup pair structure is exactly N disjoint copies of the
    original's;
  - embeddings: vec_id shift + cyclic DIMENSION ROTATION by k (norms
    preserved, cosine to the original ~ random), labels offset per
    replica so label-blocked operators see N x blocks, not N x block
    SIZE.

Usage: python3 tools/make_scaled.py <srcSfDir> <outDir> [replicas=10]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 10_000_000

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def shift_table(tbl: pa.Table, shift_cols, k: int) -> pa.Table:
    if k == 0:
        return tbl
    arrays = []
    for name in tbl.column_names:
        col = tbl[name]
        if name in shift_cols:
            col = pc.add(col, pa.scalar(k * STRIDE, type=pa.int64()))
        arrays.append(col)
    return pa.table(dict(zip(tbl.column_names, arrays)))


def salt_documents(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    texts = tbl["text"].to_pylist()
    salted = [
        None if t is None else
        " ".join((w + f"r{k}") if w else w for w in t.split(" "))
        for t in texts
    ]
    cols = {}
    for name in tbl.column_names:
        if name == "text":
            cols[name] = pa.array(salted, type=pa.string())
        elif name == "n_chars":
            cols[name] = pa.array(
                [None if t is None else len(t) for t in salted],
                type=pa.int64())
        else:
            cols[name] = tbl[name]
    return pa.table(cols)


def rotate_embeddings(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    # rot = k % 64 would make replica 64 an exact un-rotated copy of the
    # original (violating the no-shared-semantic-structure invariant), so
    # the dimension count is a hard ceiling on replicas — assert rather
    # than silently wrap.
    dim = len(tbl["embedding"][0].as_py())
    assert k < dim, (
        f"replica {k} >= embedding dim {dim}: cyclic rotation wraps to an "
        f"exact copy; use fewer than {dim} replicas (or add a per-replica "
        f"sign-flip scheme first)")
    rot = k
    vecs = tbl["embedding"].to_pylist()
    rotated = [None if v is None else v[rot:] + v[:rot] for v in vecs]
    cols = {}
    for name in tbl.column_names:
        if name == "embedding":
            cols[name] = pa.array(rotated, type=tbl.schema.field("embedding").type)
        elif name == "label":
            cols[name] = pc.add(tbl[name], pa.scalar(k * 1000, type=pa.int32()))
        else:
            cols[name] = tbl[name]
    return pa.table(cols)


def main(src: str, out: str, replicas: int) -> None:
    os.makedirs(out, exist_ok=True)
    for t in COPY_ONCE:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl, f"{out}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} rows (copied once)")
    for t, cols in SHIFT_COLS.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        # One FILE per replica inside a <table>.parquet directory: a scaled
        # store written as a single giant file caps Spark's scan at one
        # input split (maxPartitionBytes can't split what one row group
        # holds, and a ~100 MB file is 1 split either way), serializing
        # every scan — an artifact no real large store has. Spark reads
        # the directory transparently; the oracle tools glob it.
        d = f"{out}/{t}.parquet"
        os.makedirs(d, exist_ok=True)
        total = 0
        # embeddings cap at dim replicas (rotation k in [0, dim) — k = dim
        # would wrap to an exact copy, see rotate_embeddings); beyond-cap
        # stores scale every OTHER table fully and embeddings to the cap,
        # which the probe reports per-table.
        n_t = replicas
        if t == "embeddings":
            dim = len(base["embedding"][0].as_py())
            n_t = min(replicas, dim)
        for k in range(n_t):
            rep = shift_table(base, cols, k)
            if t == "documents":
                rep = salt_documents(rep, k)
            elif t == "embeddings":
                rep = rotate_embeddings(rep, k)
            total += rep.num_rows
            pq.write_table(rep, f"{d}/part-{k:03d}.parquet")
        print(f"{t}: {base.num_rows} -> {total} rows ({n_t} files)")


if __name__ == "__main__":
    src, out = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, out, n)
