#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only, not
part of the shipped library): reads Verify.scala output (parquet per query
+ oracle_sql.json), runs each oracle in DuckDB against the sf tables, and
compares cell-by-cell with columns sorted by name.

Stricter than value-tolerance on purpose — the driver's hasher is exact:
  * floats compare BITWISE (so -0.0 vs 0.0 and last-ULP rounding
    divergence fail here exactly like they fail in the driver);
  * physical column types must match between the Spark parquet and the
    DuckDB oracle result (INTEGER vs BIGINT, HUGEINT/DECIMAL window
    sums, FLOAT vs DOUBLE all fail — the round-8/9 local-green/
    driver-red class);
  * rows are re-sorted with pandas sort_values over all columns before
    comparing, exactly like the driver — so a column pandas cannot
    hash (numpy arrays, the round-10 local-green/driver-red class)
    crashes HERE first, and any ORDER BY divergence is forgiven the
    same way the driver forgives it.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [name ...]
"""
import json, math, os, struct, sys, time

import duckdb


def driver_sort_order(df, cols):
    """Replicate the driver's pandas re-sort: sort_values over all
    columns (name order) and return the resulting row order. Raises
    TypeError on unsortable columns (e.g. arrays), as the driver does.
    """
    if df.empty:
        return list(df.index)
    return list(df.sort_values(by=cols, kind="mergesort").index)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        if not (isinstance(a, float) and isinstance(b, float)):
            return False  # int-vs-float physical mismatch
        if math.isnan(a) and math.isnan(b):
            return True
        # bitwise: catches -0.0 vs 0.0 and 1-ULP round() divergence
        return struct.pack(">d", a) == struct.pack(">d", b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


def type_names(rel):
    return [str(t) for t in rel.types]


def main(out_dir, sf_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    failures = 0
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no Verify output dir")
            failures += 1
            continue
        try:
            # ONE execution per side: rows and the pandas sort frame
            # both derive from the same Arrow table, so the sort
            # permutation is valid for the rows it reorders (a second
            # execution could return ties in a different order) and
            # heavyweight oracles run once, not twice
            def run(rel):
                cols, types = rel.columns, type_names(rel)
                tab = rel.arrow()
                rows = [tuple(d[c] for c in cols) for d in tab.to_pylist()]
                return cols, types, rows, tab.to_pandas()
            gcols, gtypes, grows, gdf = run(
                con.sql(f"SELECT * FROM '{qdir}/*.parquet'"))
            wcols, wtypes, wrows, wdf = run(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if sorted(c.lower() for c in gcols) != sorted(c.lower() for c in wcols):
            print(f"FAIL {name}: columns spark={sorted(gcols)} oracle={sorted(wcols)}")
            failures += 1
            continue
        gi = [i for _, i in sorted((c.lower(), i) for i, c in enumerate(gcols))]
        wi = [i for _, i in sorted((c.lower(), i) for i, c in enumerate(wcols))]
        # physical-type compare, aligned by (lowercased) column name
        tbad = [(gcols[i], gtypes[i], wtypes[j]) for i, j in zip(gi, wi)
                if gtypes[i] != wtypes[j]]
        if tbad:
            for c, gt, wt in tbad:
                print(f"FAIL {name}: column {c} type spark={gt} oracle={wt}")
            failures += 1
            continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(wrows)}")
            failures += 1
            continue
        # driver-style pandas re-sort over all columns (name order);
        # crashes on unsortable columns exactly like the driver
        try:
            grows = [grows[k] for k in
                     driver_sort_order(gdf, [gcols[i] for i in gi])]
            wrows = [wrows[k] for k in
                     driver_sort_order(wdf, [wcols[j] for j in wi])]
        except (TypeError, ValueError) as e:
            # TypeError: multi-column sort over unhashable arrays;
            # ValueError: single-column sort over numpy arrays — both
            # are the driver's crash class and must FAIL this query
            # only, not abort the whole gate
            print(f"FAIL {name}: driver row-sort crash: {e}")
            failures += 1
            continue
        bad = None
        for r, (gr, wr) in enumerate(zip(grows, wrows)):
            for a, b in zip((gr[i] for i in gi), (wr[i] for i in wi)):
                if not eq(a, b):
                    bad = (r, a, b)
                    break
            if bad:
                break
        if bad:
            r, a, b = bad
            print(f"FAIL {name}: row {r}: spark={a!r} oracle={b!r}")
            print(f"  spark row:  {grows[r]}")
            print(f"  oracle row: {wrows[r]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(grows)} rows ({time.time() - t0:.2f}s)")
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3:]) or None))
