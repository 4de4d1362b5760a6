#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir] [--json report.json]
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran (or run
with --run to invoke it). Reads each <outDir>/<name> parquet (Spark result),
runs SparkEntry's oracle SQL (from <outDir>/oracle_sql.json) in DuckDB over
the raw testdata tables, and compares: sort columns by name, sort rows,
compare cell-by-cell (exact for strings/ints, tiny-eps for floats).
--json writes a per-query report in the driver's CORRECTNESS_r{N}.json
format (rows_match/schema_match/hash_match/spark_rows/oracle_rows/err), so
off-driver sweeps (e.g. the sf1 scale run) produce comparable artifacts.
"""
import duckdb, json, sys, os, glob, math, subprocess

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        # match on 9 significant decimals; results are pre-rounded on both sides
        return f"{v:.9g}"
    if isinstance(v, bool): return str(int(v))
    return str(v)

def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out

def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = pos[0] if len(pos) > 0 else "/root/testdata/sf0.01"
    out = pos[1] if len(pos) > 1 else "/tmp/verify_out"
    json_out = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else None
    report = {}
    if "--run" in sys.argv:
        subprocess.run(["sbt", f'runMain graft.Verify {sf} {out}'], check=True, cwd="/root/repo")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    def record(name, rows=None, schema=None, hsh=None, srows=None, orows=None, err=None):
        report[name] = {"rows_match": rows, "schema_match": schema, "hash_match": hsh,
                        "spark_rows": srows, "oracle_rows": orows, "err": err}
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            record(name, err="no spark output"); continue
        try:
            sres = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols, srows = normalize(sres.fetchall(), sres.columns)
            ores = con.sql(sql)
            ocols, orows = normalize(ores.fetchall(), ores.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1
            record(name, err=str(e)[:400]); continue
        record(name, rows=len(srows) == len(orows), schema=scols == ocols,
               hsh=srows == orows, srows=len(srows), orows=len(orows))
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}"); n_fail += 1; continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}"); n_fail += 1
            for a, b in list(zip(srows, orows))[:3]: print("   s:", a, "\n   o:", b)
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first:")
            for a, b in bad[:3]: print("   s:", a, "\n   o:", b)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
    # queries with no oracle: report rows-only
    qnames = {os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d)}
    for name in sorted(qnames - set(oracles)):
        files = glob.glob(f"{out}/{name}/*.parquet")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{name}/*.parquet')").fetchone()[0] if files else 0
        print(f"ROWS-ONLY {name}: {n} rows")
        record(name, srows=n, err="no_oracle")
    if json_out:
        # corpus stamp (the BENCH convention, judge r11 #10): counts, text
        # bytes, and an order-invariant id fingerprint, so every re-record
        # is attributable to a corpus generation without forensics. DuckDB's
        # hash() differs from Spark's xxhash64, so the fields are suffixed —
        # compare CORRECTNESS stamps with CORRECTNESS stamps.
        try:
            d = con.sql(f"SELECT count(*), sum(length(text)), sum(hash(doc_id))::hugeint"
                        f" FROM read_parquet('{sf}/documents.parquet')").fetchone()
            e = con.sql(f"SELECT count(*), sum(hash(vec_id))::hugeint"
                        f" FROM read_parquet('{sf}/embeddings.parquet')").fetchone()
            report["_corpus"] = {"docs": d[0], "text_bytes": int(d[1]),
                                 "docs_fp_duckdb": str(d[2]),
                                 "vecs": e[0], "vecs_fp_duckdb": str(e[1]), "sf_dir": sf}
        except Exception as e:
            report["_corpus"] = {"err": str(e)[:200]}
        json.dump(report, open(json_out, "w"), indent=2, sort_keys=True)
        print(f"report -> {json_out}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
