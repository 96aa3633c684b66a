#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only, not
part of the shipped library): reads Verify.scala output (parquet per query
+ oracle_sql.json), runs each oracle in DuckDB against the sf tables, and
compares cell-by-cell with columns sorted by name.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import json, math, os, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def eq(a, b):
    a, b = norm(a), norm(b)
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isinf(fa) or math.isinf(fb):
            return fa == fb
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no Verify output dir")
            failures += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
            gcols, grows = got.columns, got.fetchall()
            want = con.sql(sql)
            wcols, wrows = want.columns, want.fetchall()
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
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(wrows)}")
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
    sys.exit(main(sys.argv[1], sys.argv[2]))
