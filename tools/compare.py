#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <verifyOutDir> <sfDir>

Reads each <name>.parquet result that graft.Verify wrote, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the raw
parquet tables in <sfDir>, and compares: column names (sorted), row
count, and a canonical value form over rows sorted by all columns.

The fetch paths deliberately mimic the driver's pandas comparator
(round 6 lesson): the oracle side comes from DuckDB via `.df()`
(pandas), the Spark side from parquet via pyarrow→pandas. This is
what makes REPRESENTATION differences visible locally — e.g. a
DECIMAL output column arrives as float64 from DuckDB's `.df()` but
as Python Decimal objects from pyarrow's decimal128, so identical
values canon differently and the row fails here exactly as it fails
on the driver. Raw `fetchall()` (both sides → Decimal) hid that
class and let q125 pass locally while the driver failed it.
"""
import json, math, os, sys
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cell(v):
    """Canonical string for one pandas cell, preserving type identity.

    Type matters, not just value: Decimal('1') must differ from 1.0
    (the driver hashes them differently), so the canonical form keeps
    the Python-side type visible via repr for non-primitive types.
    """
    import numpy as np
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise TypeError(f"nested value in result column: {v!r:.80}")
    if v is None or v is pd.NaT:
        return "None"
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer, int)):
        return repr(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, str):
        return repr(v)
    # Decimal, bytes, date, and anything exotic: repr keeps the type
    # tag (e.g. "Decimal('10117764')") so a representation divergence
    # between the two fetch paths cannot cancel out.
    return repr(v)


def canon(df):
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        vals = []
        for v in row:
            # pd.isna on scalars only (it raises on lists — let cell
            # reject those); NaN floats keep their "NaN" form via cell
            try:
                na = v is None or v is pd.NaT
            except Exception:
                na = False
            vals.append("None" if na else cell(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = n_skip = 0
    # Optional per-query disposition artifact (GRAFT_COMPARE_JSON=path):
    # the scale-rung sweeps need a machine-readable record of every
    # query's outcome — match / fail / oracle stop-line / no oracle —
    # not just the tallies, so a rung's oracle coverage is a number.
    # Written INCREMENTALLY (rewritten after every query) so a killed
    # or wedged sweep still leaves the dispositions it completed.
    json_out = os.environ.get("GRAFT_COMPARE_JSON", "")
    disposition = {}
    import time as _time

    def record(name, status, **kw):
        if not json_out:
            return
        disposition[name] = {"status": status, **kw}
        tmp = json_out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(disposition, f, indent=1, sort_keys=True)
        os.replace(tmp, json_out)
    # Scale-rung controls (builder-side; the driver gate sets neither):
    # GRAFT_COMPARE_SKIP — comma list of names to skip outright (e.g.
    # already verified in a prior partial run); GRAFT_ORACLE_TIMEOUT_SEC
    # — per-query DuckDB budget, after which the oracle is interrupted
    # and the query recorded as a documented stop-line SKIP, not a FAIL
    # (at 16x+ the interpreted list-lambda oracles, not the engine, are
    # the binding cost — see SURVEY §15.9).
    skip = set(s for s in os.environ.get("GRAFT_COMPARE_SKIP", "").split(",")
               if s)
    tmo = float(os.environ.get("GRAFT_ORACLE_TIMEOUT_SEC", "0") or 0)
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        if name in skip:
            n_skip += 1
            record(name, "skipped")
            print(f"  - {name}: SKIPPED (GRAFT_COMPARE_SKIP)")
            continue
        # Spark side: pyarrow→pandas, the driver's read path for the
        # Verify parquet dumps.
        got = pd.read_parquet(os.path.join(outdir, name))
        got.columns = [c.lower() for c in got.columns]
        if name not in oracle:
            n_noracle += 1
            record(name, "no_oracle", spark_rows=len(got))
            print(f"  ~ {name}: no oracle, rows={len(got)}"
                  + ("  [EMPTY!]" if not len(got) else ""))
            continue
        timer = None
        timed_out = []
        if tmo > 0:
            import threading
            timer = threading.Timer(tmo, lambda: (timed_out.append(True),
                                                  con.interrupt()))
            timer.start()
        t0 = _time.time()
        try:
            # Oracle side: DuckDB via .df() — pandas conversion applies
            # the same type coercions the driver sees (DECIMAL→float64).
            exp = con.sql(oracle[name]).df()
            exp.columns = [c.lower() for c in exp.columns]
        except Exception as e:
            if timed_out:
                n_skip += 1
                record(name, "oracle_stopline", spark_rows=len(got),
                       timeout_sec=tmo)
                print(f"  - {name}: ORACLE TIMEOUT after {tmo:.0f}s "
                      f"(stop-line: oracle cost, engine result present, "
                      f"rows={len(got)})")
            else:
                record(name, "oracle_error", err=str(e)[:200])
                print(f"  ✗ {name}: oracle SQL failed: {e}")
                n_fail += 1
            continue
        finally:
            if timer is not None:
                timer.cancel()
        oracle_sec = round(_time.time() - t0, 1)
        if sorted(got.columns) != sorted(exp.columns):
            record(name, "fail_columns", spark_rows=len(got),
                   oracle_rows=len(exp), oracle_sec=oracle_sec)
            print(f"  ✗ {name}: columns differ got={sorted(got.columns)}"
                  f" exp={sorted(exp.columns)}")
            n_fail += 1
            continue
        try:
            g, e = canon(got), canon(exp)
        except TypeError as err:
            record(name, "fail_types", err=str(err)[:200])
            print(f"  ✗ {name}: {err}")
            n_fail += 1
            continue
        if len(g) != len(e):
            record(name, "fail_rows", spark_rows=len(g), oracle_rows=len(e),
                   oracle_sec=oracle_sec)
            print(f"  ✗ {name}: rowcount got={len(g)} exp={len(e)}")
            n_fail += 1
        elif g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            record(name, "fail_values", spark_rows=len(g),
                   oracle_rows=len(e), oracle_sec=oracle_sec)
            print(f"  ✗ {name}: values differ at sorted-row {bad}:")
            print(f"      got: {g[bad]}")
            print(f"      exp: {e[bad]}")
            n_fail += 1
        else:
            record(name, "match", spark_rows=len(g), oracle_sec=oracle_sec)
            print(f"  ✓ {name}: {len(g)} rows match")
            n_pass += 1
    line = f"PASS={n_pass} FAIL={n_fail} NO_ORACLE={n_noracle}"
    if n_skip:
        line += f" SKIP={n_skip}"
    print(line)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
