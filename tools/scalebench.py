#!/usr/bin/env python3
"""Per-query cost-scaling artifact (VERDICT r14 #1, extended to 64x in r16).

Correctness scaling is proven at five rungs; COST scaling was only
ever inferred from aggregate verify walls, which can hide one
super-linear query inside a sum. This tool merges full graft.Bench
outputs (the sf0.1 bench corpus, the 4x corpus, the 16x corpus, and —
since round 16 — optionally the 64x corpus; same reps, same cpus)
into one artifact with the per-query medians and their scale ratios,
and flags any query whose top-rung/sf0.1 ratio exceeds the
super-linear line.

Usage:
  python3 tools/scalebench.py <bench_sf01.json> <bench_4x.json> \
      <bench_16x.json> <out.json> [flag_ratio]
  python3 tools/scalebench.py <bench_sf01.json> <bench_4x.json> \
      <bench_16x.json> --x64 <bench_64x.json> <out.json> [flag_ratio]

Each input is a graft.Bench SPARK_GRAFT_BENCH_OUT file (the FULL line
is the first line). flag_ratio defaults to 20.0 for the 16x rung: 16x
the rows on the same 32 cores is at most ~16x the work for a
linear-shape plan, plus scheduling overhead — a query beyond 20x is
growing super-linearly and gets adjudicated by name, the way
benchnorm adjudicates window drift. The 64x flag line scales the same
allowance: 64/16 * flag_ratio (so 80.0 at the default).

Two structural notes the thresholds encode:
  - only documents/embeddings/events/lineitem scale in the ScaleData
    corpora (dimensions are copied verbatim), so dimension-only
    queries ride near ratio 1 — that is sub-linear, never flagged;
  - the bench's fixed per-query floor (~60-100 ms of plan/submit
    time) makes small queries read sub-linear too; the flag line only
    catches growth, so the floor cannot mask a super-linear query.
"""
import json
import sys


def load(path):
    with open(path) as f:
        line = f.readline()
    d = json.loads(line)
    return d


def main(p01, p4, p16, out, flag_ratio=20.0, p64=None):
    b01, b4, b16 = load(p01), load(p4), load(p16)
    b64 = load(p64) if p64 else None
    qs = sorted(b01["queries"])
    assert set(qs) == set(b4["queries"]) == set(b16["queries"]), \
        "bench runs cover different query sets"
    if b64:
        assert set(qs) == set(b64["queries"]), \
            "64x bench covers a different query set"
    flag64 = flag_ratio * 4.0
    rows = {}
    flagged = []
    flagged64 = []
    for q in qs:
        m01, m4, m16 = (b01["queries"][q], b4["queries"][q],
                        b16["queries"][q])
        r4 = round(m4 / m01, 2) if m01 > 0 else None
        r16 = round(m16 / m01, 2) if m01 > 0 else None
        rows[q] = {"sf0.1_sec": m01, "4x_sec": m4, "16x_sec": m16,
                   "ratio_4x": r4, "ratio_16x": r16}
        if b64:
            m64 = b64["queries"][q]
            r64 = round(m64 / m01, 2) if m01 > 0 else None
            rows[q]["64x_sec"] = m64
            rows[q]["ratio_64x"] = r64
            if r64 is not None and r64 > flag64:
                flagged64.append(q)
        if r16 is not None and r16 > flag_ratio:
            flagged.append(q)
    runs = [("sf0.1", b01), ("4x", b4), ("16x", b16)]
    if b64:
        runs.append(("64x", b64))
    meta = {k: {
        "total_sec": b["value"], "n": b["n"], "reps": b["reps"],
        "cpus": b["cpus"], "sf": b["sf"], "failed": b["failed"],
        "calib_ms_med": b.get("calib_ms_med"),
        "memcalib_ms_med": b.get("memcalib_ms_med"),
        "window_ok": b.get("window_ok"),
        "majflt_total": b.get("majflt_total"),
        "artifact_build": b.get("artifact_build"),
    } for k, b in runs}
    artifact = {
        "metric": "bench_scale",
        "flag_ratio_16x": flag_ratio,
        "flagged": sorted(flagged,
                          key=lambda q: -rows[q]["ratio_16x"]),
        "runs": meta,
        "queries": rows,
    }
    if b64:
        artifact["flag_ratio_64x"] = flag64
        artifact["flagged_64x"] = sorted(
            flagged64, key=lambda q: -rows[q]["ratio_64x"])
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    top = "ratio_64x" if b64 else "ratio_16x"
    worst = sorted(qs, key=lambda q: -(rows[q].get(top) or 0))[:10]
    print(f"flagged (>~{flag_ratio}x at 16x): {flagged or 'none'}")
    if b64:
        print(f"flagged (>~{flag64}x at 64x): {flagged64 or 'none'}")
    print(f"worst {top}/sf0.1 ratios:")
    for q in worst:
        r = rows[q]
        if b64:
            print(f"  {q}: {r['sf0.1_sec']:.3f} -> {r['64x_sec']:.3f} "
                  f"({r['ratio_64x']}x; 16x={r['ratio_16x']}x; "
                  f"4x={r['ratio_4x']}x)")
        else:
            print(f"  {q}: {r['sf0.1_sec']:.3f} -> {r['16x_sec']:.3f} "
                  f"({r['ratio_16x']}x; 4x={r['ratio_4x']}x)")


if __name__ == "__main__":
    args = sys.argv[1:]
    p64 = None
    if "--x64" in args:
        i = args.index("--x64")
        if i + 1 >= len(args):
            sys.exit(__doc__)
        p64 = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) not in (4, 5):
        sys.exit(__doc__)
    main(args[0], args[1], args[2], args[3],
         float(args[4]) if len(args) == 5 else 20.0, p64=p64)
