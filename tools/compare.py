#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <verifyOutDir> <sfDir>

Reads each <name>.parquet result that graft.Verify wrote, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the raw
parquet tables in <sfDir>, and compares: column names (sorted), row
count, and value-hash over rows sorted by all columns.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            # the driver's pandas-based comparator cannot sort nested
            # values (round 3: q73's list column → "unhashable type");
            # reject them here so the local gate is at least as strict
            if isinstance(v, (list, tuple, dict)):
                raise TypeError(f"nested value in result column: {v!r:.80}")
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    import os
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        got_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        gcols = [c.lower() for c in got_rel.columns]
        grows = got_rel.fetchall()
        if name not in oracle:
            n_noracle += 1
            print(f"  ~ {name}: no oracle, rows={len(grows)}"
                  + ("  [EMPTY!]" if not grows else ""))
            continue
        try:
            exp_rel = con.sql(oracle[name])
            ecols = [c.lower() for c in exp_rel.columns]
            erows = exp_rel.fetchall()
        except Exception as e:
            print(f"  ✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"  ✗ {name}: columns differ got={sorted(gcols)} exp={sorted(ecols)}")
            n_fail += 1
            continue
        try:
            g, e = canon(grows, gcols), canon(erows, ecols)
        except TypeError as err:
            print(f"  ✗ {name}: {err}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"  ✗ {name}: rowcount got={len(g)} exp={len(e)}")
            n_fail += 1
        elif g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            print(f"  ✗ {name}: values differ at sorted-row {bad}:")
            print(f"      got: {g[bad]}")
            print(f"      exp: {e[bad]}")
            n_fail += 1
        else:
            print(f"  ✓ {name}: {len(g)} rows match")
            n_pass += 1
    print(f"PASS={n_pass} FAIL={n_fail} NO_ORACLE={n_noracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
