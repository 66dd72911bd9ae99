#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (with each
testdata table registered as a view over <sfDir>/<t>.parquet), then
compare: row count, column names (sorted), dtypes, and a hash of the
value matrix after sorting columns by name and rows by all columns.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql, label):
    df = con.execute(rel_sql).fetchdf()
    df = df[sorted(df.columns)]
    # The driver's comparator cannot hash array-typed cells (pandas
    # sort_values -> Categorical -> factorize raises "unhashable type:
    # numpy.ndarray" before values are even compared), so registered
    # verify outputs must be SCALAR-typed. Fail loudly here so local
    # green predicts driver green — flatten arrays with array_join
    # (Spark) / string_agg (DuckDB), the q43/q76 pattern.
    for c in df.columns:
        for v in df[c]:
            if isinstance(v, (list, tuple, dict, set)) \
                    or type(v).__name__ == "ndarray":
                raise ValueError(
                    f"{label} column '{c}' is array-typed; registered "
                    "verify outputs must be scalar — flatten with "
                    "array_join/string_agg")
            if v is not None:
                break
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None:
                row.append("NULL")
            elif isinstance(v, float):
                row.append("NULL" if v != v else repr(v))
            else:
                s = str(v)
                row.append("NULL" if s in ("NaT", "nan", "None", "<NA>") else s)
        rows.append("|".join(row))
    rows.sort()
    return list(df.columns), [str(t) for t in df.dtypes], rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    # an oracle entry with no output dir means the query THREW in
    # Verify (which logs-and-continues) — that is a failure, not a gap.
    # Skipped for filtered runs (Verify's `only` arg), recognized by
    # most oracle entries having no output at all.
    missing = sorted(set(oracle) - set(names))
    if len(missing) <= len(names):
        for name in missing:
            print(f"✗ {name}: NO OUTPUT (query failed in Verify — see stderr)")
            fail += 1
    elif missing:
        print(f"(filtered run: {len(missing)} oracle entries not executed)")
    for name in names:
        got_sql = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        if name not in oracle:
            n = con.execute(got_sql).fetchall()
            print(f"  {name}: NO-ORACLE rows={len(n)}")
            continue
        try:
            gcols, gtypes, grows = canon(con, got_sql, "spark")
            ocols, otypes, orows = canon(con, oracle[name], "oracle")
        except Exception as e:
            print(f"✗ {name}: ERROR {e}")
            fail += 1
            continue
        problems = []
        if gcols != ocols:
            problems.append(f"cols {gcols} != {ocols}")
        if gtypes != otypes:
            problems.append(f"types {gtypes} != {otypes}")
        if len(grows) != len(orows):
            problems.append(f"rowcount {len(grows)} != {len(orows)}")
        if not problems and grows != orows:
            diff = [(a, b) for a, b in zip(grows, orows) if a != b][:3]
            problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"✗ {name}: " + "; ".join(problems))
            fail += 1
        else:
            print(f"✓ {name}: {len(grows)} rows")
            ok += 1
    print(f"\n{ok} ok, {fail} fail, {len(names) - ok - fail} no-oracle")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
