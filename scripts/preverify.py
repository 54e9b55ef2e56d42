#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify first, then
this script. For every query output parquet in OUTDIR it replays the
matching oracle SQL from oracle_sql.json in DuckDB over the same sfDir
tables and diffs values exactly (columns sorted by name, rows in result
order, NaN-safe). Dev-only — the shipped library has no Python dependency.

Usage: preverify.py SFDIR OUTDIR [query ...]
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        if only and name not in only:
            continue
        # sorted: rows are compared pairwise in file-read order, which is
        # only stable if multi-part outputs are read in a fixed order
        files = sorted(glob.glob(os.path.join(qdir, "*.parquet")))
        if not files:
            print(f"EMPTYDIR {name}")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        if name not in oracle:
            print(f"skip     {name} (no oracle; rows={got.num_rows})")
            n_skip += 1
            continue
        try:
            want = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"ORAFAIL  {name}: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"COLFAIL  {name}: spark={gcols} oracle={wcols}")
            n_fail += 1
            continue
        grows = [tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()]
        wrows = [tuple(norm(r[c]) for c in wcols) for r in want.to_pylist()]
        if len(grows) != len(wrows):
            print(f"ROWFAIL  {name}: spark={len(grows)} oracle={len(wrows)}")
            n_fail += 1
            continue
        bad = [(i, g, w) for i, (g, w) in enumerate(zip(grows, wrows)) if g != w]
        if bad:
            i, g, w = bad[0]
            print(f"VALFAIL  {name}: {len(bad)}/{len(grows)} rows differ; "
                  f"first at {i}:\n  spark : {g}\n  oracle: {w}")
            n_fail += 1
        else:
            print(f"ok       {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_skip} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
