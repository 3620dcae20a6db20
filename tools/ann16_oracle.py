#!/usr/bin/env python3
"""Scale-rung oracle for q123_ann_recall at corpus sizes where the
shipped oracle SQL cannot finish (the round-11 verdict's one un-plugged
evidence-ladder hole).

Usage: python3 tools/ann16_oracle.py <verifyOutDir> <sfDir>

The shipped q123 oracle is exact but interpreter-bound in DuckDB at
16x: it (a) MATERIALIZEs LSH codes for every corpus vector through
~67 KB of list-lambda SQL, although only the ~10 query vectors and the
<= 100 exact-top-10 vectors ever have their codes READ, and (b) ranks
via a CROSS JOIN whose per-row dot product is an interpreted
list_transform lambda. This tool rewrites the DUMPED oracle SQL (from
<verifyOutDir>/oracle_sql.json — so every constant, the derived
code-width CTEs, and the +-1 projection matrices stay byte-identical to
the gate oracle) into a vectorizable but bit-equivalent form:

  - codes are computed only for the query panel and for the exact
    top-10 rows (the only consumers), not the whole corpus;
  - the exact ranking unnests the quantized vectors once and computes
    dots as a plain join-aggregate instead of per-row lambdas.

Bit-equivalence: the quantized components are INTEGRAL doubles
(round(x*1000), |v| <= ~3000), so every dot/norm sum is a sum of
integral doubles bounded far below 2^53 — exact regardless of
association order. Reordering the aggregation therefore cannot flip a
rank, and the cosine denominators divide the same exact integers. The
rewrite changes evaluation strategy, never values.

Comparison reuses compare.py's canonicalization (same pandas/pyarrow
fetch paths as the driver gate). Prints PASS/FAIL; exit 0 on PASS.
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import TABLES, canon  # noqa: E402

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

X_CTE_REWRITE = """cu AS (SELECT vec_id, i, ev[i] AS cx
  FROM c CROSS JOIN unnest(range(1, 65)) AS u(i)),
qu AS (SELECT qid, i, qv[i] AS qx
  FROM q CROSS JOIN unnest(range(1, 65)) AS u(i)),
cn AS (SELECT vec_id, sum(cx * cx) AS xx FROM cu GROUP BY 1),
qn AS (SELECT qid, sum(qx * qx) AS qq FROM qu GROUP BY 1),
dp AS (SELECT qu.qid, cu.vec_id, sum(cu.cx * qu.qx) AS d
  FROM cu JOIN qu ON cu.i = qu.i
  WHERE cu.vec_id <> qu.qid
  GROUP BY 1, 2),
x AS MATERIALIZED (
  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
    ORDER BY cos DESC, vec_id) AS rk
  FROM (SELECT dp.qid, dp.vec_id,
      dp.d / (sqrt(cn.xx) * sqrt(qn.qq)) AS cos
    FROM dp JOIN cn ON cn.vec_id = dp.vec_id
    JOIN qn ON qn.qid = dp.qid) t0),
"""


CASE_RE = re.compile(
    r"\(CASE WHEN list_sum\(list_transform\(range\(1, 65\),\s*"
    r"i -> ev\[i\] \* \((\[[-0-9,]+\])\)\[i\]\)\) > 0 "
    r"THEN (\d+) ELSE 0 END\)")


def rewrite_codes(sql):
    """q34/q35 shape: corpus-wide LSH codes are genuinely READ for every
    vector (Hamming probe / banded buckets), so unlike q123 they cannot
    be computed on demand — instead the ~34 KB of per-row list lambdas
    is reshaped into one unnest join-aggregate: the +-1 projection rows
    (extracted VERBATIM from the dumped oracle, so the constants cannot
    drift) join the unnested quantized vectors on the dimension index,
    one integral-double sum per (vector, table, bit) gives the sign,
    and a masked weight-sum rebuilds each code. Bit-equivalent by the
    same exactness argument as the ranking rewrite."""
    m = re.search(
        r"c AS MATERIALIZED \(SELECT (?P<cols>[A-Za-z_, ]+?), "
        r"\[(?P<codes>.*)\] AS cs FROM e\),\n", sql, re.S)
    if not m:
        sys.exit("oracle shape changed: corpus codes CTE not found")
    cols = m.group("cols")  # e.g. "vec_id, label, ev" / "vec_id, ev"
    values = []
    for t, piece in enumerate(m.group("codes").split("AS BIGINT)")):
        for arr, w in CASE_RE.findall(piece):
            values.append(f"({t + 1}, {w}::BIGINT, {arr})")
    if not values:
        sys.exit("oracle shape changed: no projection CASEs extracted")
    chain = (
        "pm0 AS (SELECT * FROM (VALUES\n  "
        + ",\n  ".join(values)
        + ") AS v(t, w, arr)),\n"
        "pm AS (SELECT t, w, i, arr[i] AS s\n"
        "  FROM pm0 CROSS JOIN unnest(range(1, 65)) AS u(i)),\n"
        "eu AS (SELECT vec_id, i, ev[i] AS x\n"
        "  FROM e CROSS JOIN unnest(range(1, 65)) AS u(i)),\n"
        "pdots AS (SELECT eu.vec_id, pm.t, pm.w,\n"
        "    sum(eu.x * pm.s) AS d\n"
        "  FROM eu JOIN pm ON pm.i = eu.i GROUP BY 1, 2, 3),\n"
        "vcodes AS (SELECT vec_id, t,\n"
        "    CAST(sum(CASE WHEN d > 0 THEN w ELSE 0 END) AS BIGINT) AS code\n"
        "  FROM pdots GROUP BY 1, 2),\n"
        "vcs AS (SELECT vec_id, list(code ORDER BY t) AS cs\n"
        "  FROM vcodes GROUP BY 1),\n"
        f"c AS MATERIALIZED (SELECT {cols}, cs FROM e JOIN vcs USING (vec_id)),\n")
    return sql.replace(m.group(0), chain, 1)


def rewrite(sql):
    # 1. capture the codes expression, drop it from the corpus-wide CTE
    m = re.search(
        r"c AS MATERIALIZED \(SELECT vec_id, ev,\n(.*?) AS cs FROM e\),\n",
        sql, re.S)
    if not m:
        sys.exit("oracle shape changed: corpus codes CTE not found")
    codes = m.group(1)
    sql = sql.replace(m.group(0),
                      "c AS MATERIALIZED (SELECT vec_id, ev FROM e),\n", 1)
    # 2. query panel computes its own codes (10 rows)
    qm = re.search(
        r"q AS \(SELECT vec_id AS qid, ev AS qv, cs AS qcs FROM c\n"
        r"\s*WHERE vec_id < 10\),\n", sql)
    if not qm:
        sys.exit("oracle shape changed: query-panel CTE not found")
    sql = sql.replace(
        qm.group(0),
        "q AS (SELECT vec_id AS qid, ev AS qv,\n"
        f"{codes} AS qcs FROM e\n      WHERE vec_id < 10),\n", 1)
    # 3. exact ranking: lambdas -> unnest join-aggregate
    xm = re.search(r"x AS \(\n.*?\) t0\),\n", sql, re.S)
    if not xm:
        sys.exit("oracle shape changed: exact-ranking CTE not found")
    sql = sql.replace(xm.group(0), X_CTE_REWRITE, 1)
    # 4. candidate codes on demand: only the exact top-10 rows are read
    hit = "FROM x JOIN c cv ON cv.vec_id = x.vec_id"
    if hit not in sql:
        sys.exit("oracle shape changed: hits join not found")
    sql = sql.replace(
        "hits AS (",
        "cv AS (SELECT vec_id,\n"
        f"{codes} AS cs FROM e\n"
        "  WHERE vec_id IN (SELECT vec_id FROM x WHERE rk <= 10)),\n"
        "hits AS (", 1)
    sql = sql.replace(hit, "FROM x JOIN cv ON cv.vec_id = x.vec_id", 1)
    return sql


REWRITERS = {
    "q123_ann_recall": rewrite,
    "q34_ann_lsh": rewrite_codes,
    "q35_embedding_neardup": rewrite_codes,
}


def main(outdir, sfdir, names=None):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    import time
    failed = 0
    for name in (names or ["q123_ann_recall"]):
        sql = REWRITERS[name](oracle[name])
        t0 = time.time()
        exp = con.sql(sql).df()
        exp.columns = [c.lower() for c in exp.columns]
        oracle_s = time.time() - t0
        got = pd.read_parquet(os.path.join(outdir, name))
        got.columns = [c.lower() for c in got.columns]
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns differ got={sorted(got.columns)} "
                  f"exp={sorted(exp.columns)}")
            failed += 1
            continue
        g, e = canon(got), canon(exp)
        if g != e:
            bad = next((i for i in range(min(len(g), len(e)))
                        if g[i] != e[i]), min(len(g), len(e)))
            print(f"FAIL {name}: rows got={len(g)} exp={len(e)}; "
                  f"first diff at sorted-row {bad}:")
            if bad < len(g):
                print(f"  got: {g[bad]}")
            if bad < len(e):
                print(f"  exp: {e[bad]}")
            failed += 1
            continue
        print(f"PASS {name}: {len(g)} rows match "
              f"(reshaped exact oracle, {oracle_s:.1f}s DuckDB)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3].split(",") if len(sys.argv) > 3 else None))
