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


def canontype(t):
    """Canonical type label: collapse unit-only variants that the driver's
    hasher treats as equal (it hashes python values of the same repr), but
    keep width differences (int64 vs int128/decimal) distinct."""
    import pyarrow as pa
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", canontype(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple((t.field(i).name, canontype(t.field(i).type))
                                for i in range(t.num_fields)))
    return str(t)


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
    # Oracle type-leak sweep: DESCRIBE every oracle and fail on result
    # columns whose DuckDB type Spark cannot emit (HUGEINT from sum(BIGINT),
    # DECIMAL(38,x) from sum(DECIMAL)) — these hash-mismatch at the driver
    # even when every value is identical.
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            desc = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
        except Exception:
            continue  # ORAFAIL surfaces below with the real error
        # DECIMAL(38,x) is fine — Spark emits it too (sum over decimal);
        # only int128 types have no Spark/parquet counterpart. Any
        # decimal-vs-double drift is caught by the per-query TYPEFAIL.
        leaks = [(c, t) for c, t, *_ in desc if t in ("HUGEINT", "UHUGEINT")]
        for c, t in leaks:
            print(f"TYPELEAK {name}.{c}: oracle yields {t}; "
                  f"CAST it in the oracle SQL")
            n_fail += 1
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
        # Type-exact gate (the driver's hash is type-sensitive): compare
        # Arrow types per column after canonicalizing unit-only variants
        # (timestamp precision, date32/64, large vs plain string/binary).
        tbad = []
        for c in gcols:
            gt = canontype(got.schema.field(c).type)
            wt = canontype(want.schema.field(c).type)
            if gt != wt:
                tbad.append((c, str(got.schema.field(c).type),
                             str(want.schema.field(c).type)))
        if tbad:
            for c, g, w in tbad:
                print(f"TYPEFAIL {name}.{c}: spark={g} oracle={w}")
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
