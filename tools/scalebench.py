#!/usr/bin/env python3
"""Per-query cost-scaling artifact (VERDICT r14 #1).

Correctness scaling is proven at five rungs; COST scaling was only
ever inferred from aggregate verify walls, which can hide one
super-linear query inside a sum. This tool merges three full
graft.Bench outputs (the sf0.1 bench corpus, the 4x corpus, the 16x
corpus — same reps, same cpus) into one artifact with the per-query
medians and their scale ratios, and flags any query whose 16x/sf0.1
ratio exceeds the super-linear line.

Usage:
  python3 tools/scalebench.py <bench_sf01.json> <bench_4x.json> \
      <bench_16x.json> <out.json> [flag_ratio]

Each input is a graft.Bench SPARK_GRAFT_BENCH_OUT file (the FULL line
is the first line). flag_ratio defaults to 20.0: 16x the rows on the
same 32 cores is at most ~16x the work for a linear-shape plan, plus
scheduling overhead — a query beyond 20x is growing super-linearly
and gets adjudicated by name, the way benchnorm adjudicates window
drift.

Two structural notes the thresholds encode:
  - only documents/embeddings/events/lineitem scale in the ScaleData
    corpora (dimensions are copied verbatim), so dimension-only
    queries ride near ratio 1 — that is sub-linear, never flagged;
  - the bench's fixed per-query floor (~60-100 ms of plan/submit
    time) makes small queries read sub-linear too; the flag line only
    catches growth, so the floor cannot mask a super-linear query
    (its 16x median would have to exceed 20x a floor-dominated
    number, which is exactly the signal we want).
"""
import json
import sys


def load(path):
    with open(path) as f:
        line = f.readline()
    d = json.loads(line)
    return d


def main(p01, p4, p16, out, flag_ratio=20.0):
    b01, b4, b16 = load(p01), load(p4), load(p16)
    qs = sorted(b01["queries"])
    assert set(qs) == set(b4["queries"]) == set(b16["queries"]), \
        "bench runs cover different query sets"
    rows = {}
    flagged = []
    for q in qs:
        m01, m4, m16 = (b01["queries"][q], b4["queries"][q],
                        b16["queries"][q])
        r4 = round(m4 / m01, 2) if m01 > 0 else None
        r16 = round(m16 / m01, 2) if m01 > 0 else None
        rows[q] = {"sf0.1_sec": m01, "4x_sec": m4, "16x_sec": m16,
                   "ratio_4x": r4, "ratio_16x": r16}
        if r16 is not None and r16 > flag_ratio:
            flagged.append(q)
    meta = {k: {
        "total_sec": b["value"], "n": b["n"], "reps": b["reps"],
        "cpus": b["cpus"], "sf": b["sf"], "failed": b["failed"],
        "calib_ms_med": b.get("calib_ms_med"),
        "memcalib_ms_med": b.get("memcalib_ms_med"),
        "window_ok": b.get("window_ok"),
        "majflt_total": b.get("majflt_total"),
        "artifact_build": b.get("artifact_build"),
    } for k, b in (("sf0.1", b01), ("4x", b4), ("16x", b16))}
    artifact = {
        "metric": "bench_scale",
        "flag_ratio_16x": flag_ratio,
        "flagged": sorted(flagged,
                          key=lambda q: -rows[q]["ratio_16x"]),
        "runs": meta,
        "queries": rows,
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    worst = sorted(qs, key=lambda q: -(rows[q]["ratio_16x"] or 0))[:10]
    print(f"flagged (>~{flag_ratio}x at 16x): {flagged or 'none'}")
    print("worst 16x/sf0.1 ratios:")
    for q in worst:
        r = rows[q]
        print(f"  {q}: {r['sf0.1_sec']:.3f} -> {r['16x_sec']:.3f} "
              f"({r['ratio_16x']}x; 4x={r['ratio_4x']}x)")


if __name__ == "__main__":
    if len(sys.argv) not in (5, 6):
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4],
         float(sys.argv[5]) if len(sys.argv) == 6 else 20.0)
