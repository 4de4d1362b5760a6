#!/usr/bin/env python3
"""Deterministic scale-up of the driver testdata (driver-side tooling, like
check.py — NOT part of the Spark library).

Usage: python3 scripts/scaleup.py <baseDir> <outDir> <factor> [tables]
  e.g. python3 scripts/scaleup.py /root/testdata/sf0.1 /tmp/testdata/sf1 10
  [tables] is an optional comma-separated subset (default: all) — needed past
  the decorrelation bounds (see the asserts), where documents/embeddings
  cannot be scaled soundly but the TPC-H/events families still can.

Replicates every table <factor> times with per-replica key offsets that
preserve referential integrity (l_orderkey/o_orderkey, o_custkey/c_custkey,
l_partkey/p_partkey, l_suppkey/s_suppkey, events.user_id, doc_id, vec_id).
region/nation stay fixed (dimension tables scale sub-linearly in TPC-H too).

Replica 0 is the identity — the base dataset is a strict subset of the output.

Two transforms keep pairwise-op outputs scaling LINEARLY instead of
quadratically (otherwise every doc would have <factor> exact duplicates and
dedup pair counts would grow x factor^2, which benchmarks the data artifact,
not the plan):
  * documents.text: tokens are rotated through the sorted corpus vocabulary
    by a per-replica step (vocab size is prime-ish small; any step works as
    long as replicas get distinct rotations). Word-frequency shape is
    preserved; cross-replica shingle overlap is destroyed. n_chars is
    recomputed (base data satisfies n_chars == len(text)).
  * embeddings.embedding: dimensions are cyclically rolled per replica — an
    orthogonal transform, so within-replica cosine structure is EXACTLY
    preserved while cross-replica vectors decorrelate.

events.ts preserves the INPUT's timestamp unit (the driver data has shipped
both TIMESTAMP(NANOS) and timestamp[us] across generations; graft.Tables
adapts to the footer). Written with parquet version 2.6 so sub-micro units
survive when present.
"""
import sys, os
from math import gcd
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

def stride_for(maxval: int) -> int:
    s = 10
    while s <= maxval: s *= 10
    return s

def offset_col(tbl, col, stride, r):
    if r == 0 or stride == 0: return tbl
    i = tbl.schema.get_field_index(col)
    newcol = pc.add(tbl.column(col), pa.scalar(r * stride, type=tbl.schema.field(col).type))
    return tbl.set_column(i, tbl.schema.field(col), newcol)

def main():
    base, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    all_tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    tables = sys.argv[4].split(",") if len(sys.argv) > 4 else all_tables
    assert set(tables) <= set(all_tables), f"unknown tables: {set(tables) - set(all_tables)}"
    # FK stride parents: a child table scaled without its parent would hit a
    # raw KeyError in replica() (strides only covers loaded tables). Validate
    # the dependency closure up front, naming the missing parents (ADVICE r4).
    fk_parents = {"orders": {"customer"}, "lineitem": {"orders", "part", "supplier"}}
    missing = {c: sorted(ps - set(tables)) for c, ps in fk_parents.items()
               if c in tables and not ps <= set(tables)}
    assert not missing, ("FK parent tables missing from the requested subset: "
        + "; ".join(f"'{c}' needs {','.join(ps)}" for c, ps in sorted(missing.items())))
    os.makedirs(out, exist_ok=True)
    t = {n: pq.read_table(f"{base}/{n}.parquet") for n in tables}

    stride_src = {"orderkey": ("orders", "o_orderkey"), "custkey": ("customer", "c_custkey"),
                  "partkey": ("part", "p_partkey"), "suppkey": ("supplier", "s_suppkey"),
                  "eventid": ("events", "event_id"), "userid": ("events", "user_id"),
                  "docid": ("documents", "doc_id"), "vecid": ("embeddings", "vec_id")}
    strides = {k: stride_for(pc.max(t[tb].column(c)).as_py())
               for k, (tb, c) in stride_src.items() if tb in t}
    print("strides:", strides)

    # --- documents: vocabulary-rotation text transform -----------------
    if "documents" in t:
        texts = t["documents"].column("text").to_pylist()
        vocab = sorted({w for s in texts for w in s.split(" ")})
        V = len(vocab)
        vidx = {w: i for i, w in enumerate(vocab)}
        # distinct rotation per replica; step chosen coprime-ish with V
        step = 7 if V % 7 else (3 if V % 3 else 1)
        # fail fast past the decorrelation bound: rotations repeat with
        # period V/gcd(step,V); beyond it replicas carry EXACT duplicate
        # texts and pairwise-dedup outputs grow quadratically — the data
        # artifact the transform exists to avoid (ADVICE r3). Scale a table
        # subset instead at larger factors.
        assert factor <= V // gcd(step, V), (
            f"text rotation collides: factor {factor} > {V // gcd(step, V)} "
            f"(vocab {V}, step {step}); drop 'documents' from [tables]")
        def rotate_text(s, r):
            rot = (r * step) % V
            if rot == 0: return s
            return " ".join(vocab[(vidx[w] + rot) % V] for w in s.split(" "))

    # --- embeddings: cyclic dimension roll -----------------------------
    if "embeddings" in t:
        embs = t["embeddings"].column("embedding").to_pylist()
        dim = len(embs[0])
        droll = max(1, dim // (2 * factor))
        # same fail-fast: rolls repeat with period dim/gcd(droll,dim);
        # past it cross-replica vectors are EXACT duplicates (ADVICE r3)
        assert factor <= dim // gcd(droll, dim), (
            f"embedding roll collides: factor {factor} > {dim // gcd(droll, dim)} "
            f"(dim {dim}, droll {droll}); drop 'embeddings' from [tables]")
        def roll_embs(r):
            k = (r * droll) % dim
            if k == 0: return embs
            return [v[k:] + v[:k] for v in embs]

    def replica(name, r):
        tbl = t[name]
        if name in ("region", "nation"):
            return tbl if r == 0 else None
        if name == "customer":
            return offset_col(tbl, "c_custkey", strides["custkey"], r)
        if name == "supplier":
            return offset_col(tbl, "s_suppkey", strides["suppkey"], r)
        if name == "part":
            return offset_col(tbl, "p_partkey", strides["partkey"], r)
        if name == "orders":
            tbl = offset_col(tbl, "o_orderkey", strides["orderkey"], r)
            return offset_col(tbl, "o_custkey", strides["custkey"], r)
        if name == "lineitem":
            tbl = offset_col(tbl, "l_orderkey", strides["orderkey"], r)
            tbl = offset_col(tbl, "l_partkey", strides["partkey"], r)
            return offset_col(tbl, "l_suppkey", strides["suppkey"], r)
        if name == "events":
            tbl = offset_col(tbl, "event_id", strides["eventid"], r)
            return offset_col(tbl, "user_id", strides["userid"], r)
        if name == "documents":
            tbl = offset_col(tbl, "doc_id", strides["docid"], r)
            new_texts = [rotate_text(s, r) for s in texts]
            tbl = tbl.set_column(tbl.schema.get_field_index("text"),
                                 tbl.schema.field("text"), pa.array(new_texts, pa.string()))
            n_chars = pa.array([len(s) for s in new_texts], pa.int64())
            return tbl.set_column(tbl.schema.get_field_index("n_chars"),
                                  tbl.schema.field("n_chars"), n_chars)
        if name == "embeddings":
            tbl = offset_col(tbl, "vec_id", strides["vecid"], r)
            emb_field = tbl.schema.field("embedding")
            return tbl.set_column(tbl.schema.get_field_index("embedding"),
                                  emb_field, pa.array(roll_embs(r), emb_field.type))
        raise ValueError(name)

    for name in t:
        parts = [x for x in (replica(name, r) for r in range(factor)) if x is not None]
        big = pa.concat_tables(parts)
        # small row groups so Spark's byte-range file splitting yields real
        # scan parallelism from a single file: ~64k rows on the fact tables,
        # ~4k on documents/embeddings (wide rows, and their per-row ops —
        # media synth/decode, shingling — are CPU-heavy: a single row group
        # serializes the whole family's scan stage, measured 10x on
        # video_meta at sf1). Pair with spark.sql.files.maxPartitionBytes
        # <= row-group bytes (SPARK_GRAFT_MAX_PARTITION_BYTES) to realize
        # the parallelism.
        rg = (65536 if name in ("lineitem", "events")
              else 4096 if name in ("documents", "embeddings") else 1 << 20)
        pq.write_table(big, f"{out}/{name}.parquet", version="2.6",
                       coerce_timestamps=None, row_group_size=rg)
        print(f"{name}: {big.num_rows} rows -> {out}/{name}.parquet")

    # post-check: events ts must still be nanos (graft.Tables reads raw longs)
    if "events" in t:
        ts_type = pq.read_schema(f"{out}/events.parquet").field("ts").type
        in_type = pq.read_schema(f"{base}/events.parquet").field("ts").type
        assert ts_type == in_type, f"events.ts changed unit: {in_type} -> {ts_type}"
        print("events.ts type preserved:", ts_type)

if __name__ == "__main__":
    main()
