#!/usr/bin/env python3
"""Driver-mimic correctness check: for each query output under OUTDIR,
run its oracle SQL in DuckDB over the same sf parquet tables and compare
(values compared column-name-sorted, like the driver)."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
# optional: write a CORRECTNESS_r{N}-style JSON artifact
jsonout = sys.argv[3] if len(sys.argv) > 3 else None
report = {}

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# FRESH CONNECTION PER QUERY: a heavy oracle that dies mid-spill (the
# sf10 recursive-closure incident) leaves the shared connection's buffer
# pool poisoned — every later allocation fails with OOM even for light
# queries. Per-query connections cost a few ms of view DDL and make each
# verdict independent. Explicit limits: memory_limit below RAM with
# process-heap headroom so big aggregates spill instead of bad_alloc;
# temp_directory on the big filesystem. Do NOT set
# preserve_insertion_order=false here: in DuckDB 1.0 it reorders even
# explicitly ORDER BY'd fetchdf results (measured on the sf10 clusters
# oracle), and this compare is positional.
# 75% of physical RAM (96GB on the 128GB round box): a hardcoded limit
# above a smaller machine's RAM would let DuckDB allocate toward it and
# get OS-killed instead of spilling — the exact failure the limit
# exists to prevent.
MEM_GB = max(4, int(os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
                    * 0.75 / 1e9))

def fresh_con():
    c = duckdb.connect()
    c.execute("SET TimeZone='UTC'")
    c.execute(f"SET memory_limit='{MEM_GB}GB'")
    c.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        # Driver dirs hold flat per-table files; ScaleUp output is a
        # directory of part files per table (the multi-file layout).
        path = f"{sfdir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return c

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)

def record(name, mine_rows, oracle_rows, rows_m, schema_m, hash_m, err):
    report[name] = {"rows_match": rows_m, "schema_match": schema_m,
                    "hash_match": hash_m, "spark_rows": mine_rows,
                    "oracle_rows": oracle_rows, "err": err}

fails = 0
for qdir in sorted(glob.glob(f"{outdir}/q_*")):
    name = os.path.basename(qdir)
    mine = pd.read_parquet(qdir)
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(mine)} rows {'OK' if len(mine)>0 else 'EMPTY!'}")
        record(name, len(mine), None, None, None, None, "no_oracle")
        continue
    try:
        con = fresh_con()
        try:
            ref = con.execute(oracle[name]).fetchdf()
        finally:
            con.close()
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {str(e)[:150]}"); fails += 1
        record(name, len(mine), None, None, None, None, f"oracle_sql: {str(e)[:150]}")
        continue
    a, b = norm(mine), norm(ref)
    if list(a.columns) != list(b.columns):
        print(f"{name:28s} COLUMN MISMATCH mine={list(a.columns)} ref={list(b.columns)}"); fails += 1
        record(name, len(a), len(b), len(a) == len(b), False, None, None)
        continue
    if len(a) != len(b):
        print(f"{name:28s} ROWCOUNT {len(a)} vs {len(b)}"); fails += 1
        record(name, len(a), len(b), False, True, None, None)
        continue
    # Driver parity: the driver hashes the pandas values dtype-sensitively
    # across KINDS — int64 vs float64 (e.g. DuckDB HUGEINT from an uncast
    # sum(BIGINT) materializing as float64) fails even when values agree.
    # Same-kind width differences (int32 vs int64) hash identically, so
    # only flag kind mismatches.
    dt = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
          if a[c].dtype.kind != b[c].dtype.kind]
    if dt:
        print(f"{name:28s} DTYPE MISMATCH {dt} (driver hash would fail)"); fails += 1
        record(name, len(a), len(b), True, True, False, f"dtype: {dt}")
        continue
    bad = []
    for c in a.columns:
        if str(a[c].dtype) == "float64" or str(b[c].dtype) == "float64":
            eq = np.isclose(a[c].astype(float), b[c].astype(float), rtol=0, atol=0, equal_nan=True)
        else:
            eq = (a[c].values == b[c].values) | (pd.isna(a[c]).values & pd.isna(b[c]).values)
        if not eq.all():
            i = int(np.argmin(eq))
            bad.append((c, i, a[c].iloc[i], b[c].iloc[i]))
    if bad:
        fails += 1
        print(f"{name:28s} VALUE MISMATCH {len(bad)} cols; first: col={bad[0][0]} row={bad[0][1]} mine={bad[0][2]!r} ref={bad[0][3]!r}")
        record(name, len(a), len(b), True, True, False, None)
    else:
        print(f"{name:28s} OK ({len(a)} rows)")
        record(name, len(a), len(b), True, True, True, None)
if jsonout:
    # Dataset provenance rides in the artifact (the BENCH "sf" field
    # convention): a no-oracle query's row-count shift across refreshes
    # must be attributable to a dataset change vs a behavior change.
    report["_meta"] = {"sf_dir": sfdir, "out_dir": outdir}
    # Verify dumps per-table byte/mtime generation stamps alongside the
    # parquet; fold them in so the artifact pins WHICH dataset build.
    prov_path = f"{outdir}/provenance.json"
    if os.path.exists(prov_path):
        report["_meta"]["provenance"] = json.load(open(prov_path))
    with open(jsonout, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
