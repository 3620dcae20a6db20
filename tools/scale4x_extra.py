#!/usr/bin/env python3
"""Extend a graft.tools.ScaleData 4x corpus dir with the remaining
fixture tables, so the event/warehouse queries (q121/q122/q126/q128...)
can be scale-verified too.

Usage: python3 tools/scale4x_extra.py <sfDir> <outDir>

- events: 4x rows — each original plus 3 copies with distinct event_id
  and a +k-second shift, SAME user_id, so per-user timelines densify
  4x (the stress sessionization/attribution actually face at scale).
  Written via pyarrow preserving the SOURCE fixture's ts encoding
  verbatim (currently timestamp[us] naive; historically
  TIMESTAMP(NANOS)) — graft.Tables.events is schema-adaptive, and the
  scale corpus must exercise the same branch as the production
  fixtures.
- lineitem: 4x rows — replicas with l_linenumber offset per copy
  (+10*k; fixture linenumbers are 1..7) so the (l_orderkey,
  l_linenumber) key stays UNIQUE: verbatim replicas would let any
  query whose determinism relies on tie-breaking by that key
  (row_number / order-by) diverge between Spark and the DuckDB
  oracle on this synthetic data — a false verification failure.
  Group weights still quadruple deterministically.
- all other tables: copied as-is (dimensions don't scale).

This is verification tooling in the compare.py sense (driver-side
DuckDB), not part of the Spark library.
"""
import os
import shutil
import sys

import duckdb

SMALL = ["region", "nation", "customer", "supplier", "part", "orders"]


def main(sfdir, outdir):
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    # events via pyarrow so the output schema is byte-identical to the
    # input fixture's (DuckDB's writer would re-encode the ts column;
    # pa.Table.from_pandas(schema=ev.schema) round-trips either the
    # current timestamp[us] encoding or the historical TIMESTAMP_NS one).
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sfdir}/events.parquet")
    assert ev.schema.field("ts").type in (
        pa.timestamp("us"), pa.timestamp("ns")), ev.schema
    parts = []
    for k in range(4):
        t = ev.to_pandas()
        t["event_id"] = t["event_id"] * 4 + k
        t["ts"] = t["ts"] + np.timedelta64(k, "s")
        parts.append(t)
    import pandas as pd
    allev = pd.concat(parts).sort_values("event_id")
    pq.write_table(
        pa.Table.from_pandas(allev, schema=ev.schema, preserve_index=False),
        f"{outdir}/events.parquet")
    con.sql(f"""
        COPY (
          SELECT t.* REPLACE (
            CAST(t.l_linenumber + 10 * k.k AS INTEGER) AS l_linenumber)
          FROM '{sfdir}/lineitem.parquet' t, range(0, 4) AS k(k)
        ) TO '{outdir}/lineitem.parquet' (FORMAT PARQUET)""")
    for name in SMALL:
        src = f"{sfdir}/{name}.parquet"
        dst = f"{outdir}/{name}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy(src, dst)
    # Flatten ScaleData's Spark-written directory tables to single files
    # so DuckDB's "<dir>/<name>.parquet" view pattern (compare.py) reads
    # them; Spark reads either layout.
    for name in ("documents", "embeddings"):
        d = f"{outdir}/{name}.parquet"
        if os.path.isdir(d):
            parts = [p for p in os.listdir(d) if p.endswith(".parquet")]
            assert len(parts) == 1, (name, parts)
            tmp = f"{outdir}/.{name}.parquet.tmp"
            shutil.move(os.path.join(d, parts[0]), tmp)
            shutil.rmtree(d)
            shutil.move(tmp, d)
    n_ev = con.sql(f"SELECT count(*) FROM '{outdir}/events.parquet'").fetchone()[0]
    n_li = con.sql(f"SELECT count(*) FROM '{outdir}/lineitem.parquet'").fetchone()[0]
    print(f"[scale4x_extra] {outdir}: events={n_ev} lineitem={n_li}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
