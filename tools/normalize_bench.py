#!/usr/bin/env python3
"""Join two bench artifacts on query id and report raw + scan32-normalized
ratios — the host-drift analysis that was previously done by hand in
SURVEY prose each round.

Usage:  python3 tools/normalize_bench.py OLD.json NEW.json [topN]

Accepts either artifact shape:
  - the direct graft.Bench JSON (has "queries" and usually "calib_sec"),
  - the driver wrapper (has "tail" holding the Bench stdout; the first
    {"metric":"total"...} line inside it is the artifact).

Normalization: ratio_norm = (new_sec / new_scan32) / (old_sec / old_scan32)
— scan32 (the 32-thread lineitem-aggregate calib probe recorded in every
artifact since r19) measures the host's parallel scan capacity at
recording time, so dividing each side by its own scan32 cancels host
drift and leaves the code-attributable movement. spin1 (1-thread LCG) is
printed for context: spin1 stable + scan32 moved = parallel-capacity
loss (noisy neighbor), both moved = whole-host slowdown. When either
artifact lacks calib (pre-r19 recordings), only raw ratios are reported
and the summary says so — raw cross-host ratios carry the full host
drift and must not be read as regressions (the r18→r19 lesson: the same
code measured 1.445x apart hours apart on one host).
"""
import json
import statistics
import sys


def load(path):
    doc = json.load(open(path))
    if "queries" not in doc and "tail" in doc:
        tail = str(doc["tail"]).replace("\\n", "\n")
        for line in tail.splitlines():
            line = line.strip()
            if line.startswith('{"metric":"total"'):
                doc = json.loads(line)
                break
        else:
            # the driver keeps only the LAST N bytes of Bench stdout, so
            # the artifact line is usually truncated mid-queries-map —
            # salvage what survives by regex (a PARTIAL map: queries
            # alphabetically before the cut are absent; the join below
            # simply covers fewer ids, which the summary reports)
            import re
            qs = {m.group(1): float(m.group(2)) for m in
                  re.finditer(r'"(q\w+)":([0-9][0-9.eE+-]*)', tail)}
            qs.pop("queries", None)
            doc = {"queries": {k: v for k, v in qs.items()
                               if k.startswith("q")}}
            m = re.search(r'"calib_sec":(\{[^}]*\})', tail)
            if m:
                doc["calib_sec"] = json.loads(m.group(1))
            if doc["queries"]:
                print(f"note: {path} tail truncated — salvaged "
                      f"{len(doc['queries'])} per-query entries by regex")
    if not doc.get("queries"):
        raise SystemExit(f"{path}: no per-query map")
    return doc


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    old, new = load(old_path), load(new_path)
    co, cn = old.get("calib_sec"), new.get("calib_sec")
    scale = None
    if co and cn and co.get("scan32") and cn.get("scan32"):
        # multiply raw new/old by this to cancel each side's host speed
        scale = co["scan32"] / cn["scan32"]
        print(f"calib old: spin1={co.get('spin1')} scan32={co['scan32']}   "
              f"new: spin1={cn.get('spin1')} scan32={cn['scan32']}   "
              f"host factor old/new scan32 = {scale:.3f}")
    else:
        print("calib missing on at least one side — RAW ratios only "
              "(cross-host drift NOT cancelled; do not read as regression)")
    rows = []
    for q, a in sorted(old["queries"].items()):
        b = new["queries"].get(q)
        if b is None or a <= 0:
            continue
        raw = b / a
        rows.append((q, a, b, raw, raw * scale if scale else None))
    only_old = sorted(set(old["queries"]) - set(new["queries"]))
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    key = (lambda r: r[4]) if scale else (lambda r: r[3])
    rows.sort(key=key, reverse=True)
    hdr = f"{'query':42s} {'old_s':>8s} {'new_s':>8s} {'raw':>6s}"
    if scale:
        hdr += f" {'norm':>6s}"
    print(hdr)
    for r in rows[:top_n]:
        line = f"{r[0]:42s} {r[1]:8.3f} {r[2]:8.3f} {r[3]:6.2f}"
        if scale:
            line += f" {r[4]:6.2f}"
        print(line)
    if len(rows) > top_n:
        print(f"... ({len(rows) - top_n} more; showing top {top_n} by "
              f"{'normalized' if scale else 'raw'} ratio)")
    tot_old = sum(r[1] for r in rows)
    tot_new = sum(r[2] for r in rows)
    summary = {
        "metric": "bench_normalize",
        "old": old_path, "new": new_path,
        "joined": len(rows),
        "only_old_n": len(only_old), "only_old": only_old[:10],
        "only_new_n": len(only_new), "only_new": only_new[:10],
        "total_old_sec": round(tot_old, 3),
        "total_new_sec": round(tot_new, 3),
        "total_raw_ratio": round(tot_new / tot_old, 4) if tot_old else None,
        "median_raw_ratio": round(statistics.median(r[3] for r in rows), 4),
    }
    if scale:
        summary["scan32_host_factor"] = round(scale, 4)
        summary["total_norm_ratio"] = round(tot_new / tot_old * scale, 4)
        summary["median_norm_ratio"] = round(
            statistics.median(r[4] for r in rows), 4)
        worst = rows[0]
        summary["worst_norm"] = {"query": worst[0],
                                 "ratio": round(worst[4], 3),
                                 "old_sec": round(worst[1], 3),
                                 "new_sec": round(worst[2], 3)}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
