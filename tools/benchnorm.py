#!/usr/bin/env python3
"""Per-query normalized bench comparison (the round-11 verdict's ask).

Usage: python3 tools/benchnorm.py <current> <anchor> [--tol=0.05]

Compares two bench artifacts per query, normalizing each query's wall
time by the calibration probes measured NEXT TO IT, so a cross-round
comparison separates "the plan changed" from "the host window changed".
Round 11's unresolved defect was exactly this: BENCH_r11.json read
79.08 s against a same-round anchor of 65.84 s, uniformly inflated
across unrelated queries, and the single CPU-spin calibration (2.6%
apart) could not attribute it — the degradation was memory-side.
Bench.scala now carries a second, memory-bandwidth probe ("memcalib"),
and this tool consumes both.

Accepted artifact shapes (auto-detected):
  - line-JSON as Bench.scala writes it (full line with per-query
    "queries"/"calib"/"memcalib" dicts, then a summary line) — the
    richest input; per-query calib normalization applies;
  - the driver's BENCH_r{N}.json ({"parsed": <summary>, "tail": ...}) —
    only the 15 heaviest medians ("top") are available, normalized by
    the run-level median calibrations.

Per query:  ratio_raw  = cur / anchor
            ratio_norm = ratio_raw / (cur_calib / anchor_calib)
(the calib ratio is per-query when both sides carry per-query calib,
else the run-level medians). ratio_norm > 1 after normalization is a
candidate plan regression; ratio_raw inflated while ratio_norm ~ 1 is
a window effect, and the spin-vs-mem split says which resource.

Exit status: 0 when the common-subset normalized total is within the
tolerance (default 5%, --tol to change) of the anchor, 2 otherwise —
so a round close can gate "captured on a clean-enough window" on it.
"""
import json
import math
import sys


def load(path):
    """Return (queries: {name: sec}, calib: {name: ms} | None,
    memcalib | None, calib_med, memcalib_med, total, label)."""
    text = open(path).read()
    best = None
    # try whole-file JSON (driver artifact), then line-JSON
    candidates = []
    try:
        candidates.append(json.loads(text))
    except json.JSONDecodeError:
        for line in text.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                candidates.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    for c in candidates:
        if "parsed" in c and isinstance(c["parsed"], dict):
            c = c["parsed"]
        if "queries" in c:
            best = c
            break
        if "top" in c and best is None:
            best = c
    if best is None:
        sys.exit(f"no bench JSON with 'queries' or 'top' found in {path}")
    qs = best.get("queries") or best.get("top")
    calib = best.get("calib") if isinstance(best.get("calib"), dict) else None
    memc = best.get("memcalib") \
        if isinstance(best.get("memcalib"), dict) else None
    return (qs, calib, memc, best.get("calib_ms_med"),
            best.get("memcalib_ms_med"), best.get("value"),
            "full" if "queries" in best else "top15")


def geomean(xs):
    xs = [x for x in xs if x > 0]
    return math.exp(sum(math.log(x) for x in xs) / len(xs)) if xs else float("nan")


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    flags = {a.split("=")[0]: a for a in argv if a.startswith("--")}
    if len(args) != 2:
        sys.exit(__doc__)
    tol_flag = flags.get("--tol", "--tol=0.05")
    if "=" not in tol_flag:
        sys.exit("usage: --tol=<fraction>, e.g. --tol=0.05")
    tol = float(tol_flag.split("=", 1)[1])
    cur_q, cur_c, cur_m, cur_cm, cur_mm, cur_total, cur_kind = load(args[0])
    anc_q, anc_c, anc_m, anc_cm, anc_mm, anc_total, anc_kind = load(args[1])

    common = sorted(set(cur_q) & set(anc_q))
    dropped_cur = sorted(set(cur_q) - set(anc_q))
    dropped_anc = sorted(set(anc_q) - set(cur_q))

    def calib_ratio(name):
        if cur_c and anc_c and name in cur_c and name in anc_c \
                and anc_c[name] > 0:
            return cur_c[name] / anc_c[name]
        if cur_cm and anc_cm and anc_cm > 0:
            return cur_cm / anc_cm
        return 1.0

    rows = []
    for name in common:
        a, b = cur_q[name], anc_q[name]
        if a <= 0 or b <= 0:
            continue
        raw = a / b
        cr = calib_ratio(name)
        rows.append((name, a, b, raw, raw / cr if cr > 0 else raw))
    if not rows:
        # disjoint query sets: nothing was actually compared — a close
        # gated on this tool must FAIL here, not pass vacuously
        print(f"NO_OVERLAP: zero common queries between {args[0]} and "
              f"{args[1]} — nothing compared")
        print(json.dumps({"common": 0, "verdict": "NO_OVERLAP",
                          "tolerance": tol}))
        return 2

    raw_total = sum(r[1] for r in rows) / max(sum(r[2] for r in rows), 1e-9)
    spin_r = (cur_cm / anc_cm) if (cur_cm and anc_cm) else None
    mem_r = (cur_mm / anc_mm) if (cur_mm and anc_mm) else None
    norm_total = raw_total / spin_r if spin_r else raw_total
    gm_norm = geomean([r[4] for r in rows])

    print(f"current: {args[0]} ({cur_kind}, total="
          f"{cur_total if cur_total is not None else 'n/a'})")
    print(f"anchor:  {args[1]} ({anc_kind}, total="
          f"{anc_total if anc_total is not None else 'n/a'})")
    print(f"common queries: {len(rows)}"
          + (f"  (only in current: {len(dropped_cur)})" if dropped_cur else "")
          + (f"  (only in anchor: {len(dropped_anc)})" if dropped_anc else ""))
    if spin_r:
        print(f"window: spin-calib ratio {spin_r:.3f}"
              + (f", mem-calib ratio {mem_r:.3f}" if mem_r else
                 " (anchor has no memcalib — mem dimension unavailable)"))
    print(f"subset total ratio: raw {raw_total:.3f}, "
          f"spin-normalized {norm_total:.3f}; per-query geomean "
          f"(calib-normalized) {gm_norm:.3f}")

    worst = sorted(rows, key=lambda r: -r[4])[:8]
    best = sorted(rows, key=lambda r: r[4])[:5]
    print("\nlargest normalized ratios (candidate regressions):")
    for name, a, b, raw, norm in worst:
        print(f"  {name:36s} {b:7.3f}s -> {a:7.3f}s  "
              f"raw {raw:5.2f}x  norm {norm:5.2f}x")
    print("largest normalized improvements:")
    for name, a, b, raw, norm in best:
        print(f"  {name:36s} {b:7.3f}s -> {a:7.3f}s  "
              f"raw {raw:5.2f}x  norm {norm:5.2f}x")

    verdict = "CLEAN" if abs(norm_total - 1.0) <= tol else (
        "FASTER" if norm_total < 1.0 else "DEGRADED")
    summary = {
        "common": len(rows), "raw_total_ratio": round(raw_total, 4),
        "norm_total_ratio": round(norm_total, 4),
        "geomean_norm": round(gm_norm, 4),
        "spin_calib_ratio": round(spin_r, 4) if spin_r else None,
        "mem_calib_ratio": round(mem_r, 4) if mem_r else None,
        "tolerance": tol, "verdict": verdict,
    }
    print("\n" + json.dumps(summary))
    return 0 if verdict in ("CLEAN", "FASTER") else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
