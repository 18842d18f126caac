#!/usr/bin/env python3
"""Round-over-round bench adjudication: diff two bench_per_query.json
records (or a record vs a BENCH_r*.json tail line) and print per-query
deltas, so "is the total move real or noise?" is answerable from
artifacts instead of a re-measurement session (the r7 96->145s scare).

Usage:
  tools/bench_diff.py OLD.json NEW.json [--min-delta 0.5] [--min-ratio 1.5]
  tools/bench_diff.py --streaming OLD_stream.json NEW_stream.json

Reads the {"queries": {name: secs}} map from each file (first JSON line
holding one). Queries present in only one file are listed separately.
With --streaming, reads {"metric":"streaming_throughput", gate:
{"rows_per_s":...}} lines (reports/streaming_throughput.json) and diffs
the per-gate rates instead.
A uniform inflation across families reads as machine load; isolated
spikes read as plan regressions - the per-family summary at the bottom
makes that call quickly.
"""
import json, sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(d, dict) and isinstance(d.get("queries"), dict):
                return d
    raise SystemExit(f"{path}: no JSON line with a 'queries' map")


def load_streaming(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(d, dict) and d.get("metric") == "streaming_throughput":
                return {k: v for k, v in d.items()
                        if isinstance(v, dict) and "rows_per_s" in v}
    raise SystemExit(f"{path}: no streaming_throughput JSON line")


def diff_streaming(old_path, new_path):
    old, new = load_streaming(old_path), load_streaming(new_path)
    print(f"{'gate':20s} {'old r/s':>10s} {'new r/s':>10s} {'ratio':>7s}")
    for k in sorted(set(old) | set(new)):
        a = old.get(k, {}).get("rows_per_s")
        b = new.get(k, {}).get("rows_per_s")
        r = f"{b / a:6.2f}x" if a and b else "   n/a"
        print(f"{k:20s} {a if a is not None else '-':>10} "
              f"{b if b is not None else '-':>10} {r:>7s}")


def main():
    if "--streaming" in sys.argv[1:]:
        paths = [a for a in sys.argv[1:] if not a.startswith("--")]
        if len(paths) != 2:
            raise SystemExit(__doc__)
        return diff_streaming(*paths)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1) if "=" in a else (a.lstrip("-"), True)
                for a in sys.argv[1:] if a.startswith("--"))
    if len(args) != 2:
        raise SystemExit(__doc__)
    min_delta = float(opts.get("min-delta", 0.5))
    min_ratio = float(opts.get("min-ratio", 1.5))
    old, new = load(args[0]), load(args[1])
    oq = {k: v for k, v in old["queries"].items() if v >= 0}
    nq = {k: v for k, v in new["queries"].items() if v >= 0}
    print(f"old: total={sum(oq.values()):8.1f}s n={len(oq)} sf={old.get('sf')} iters={old.get('iters')}")
    print(f"new: total={sum(nq.values()):8.1f}s n={len(nq)} sf={new.get('sf')} iters={new.get('iters')}")
    shared = sorted(set(oq) & set(nq))
    moved = []
    for k in shared:
        a, b = oq[k], nq[k]
        d = b - a
        r = b / a if a > 0 else float("inf")
        if abs(d) >= min_delta and (r >= min_ratio or r <= 1 / min_ratio):
            moved.append((d, r, k, a, b))
    # fresh-JVM guard verdicts (r9 verdict #6): a move whose NEW number
    # came out of the fresh-JVM adjudication pass (Bench's "fresh_guard"
    # audit map) already survived an isolated re-measurement -- report it
    # as real, not load noise. Moves the guard never flagged were within
    # 1.5x of the committed references at record time.
    guard = new.get("fresh_guard") or {}
    if moved:
        print(f"\nmoved (|delta| >= {min_delta}s and ratio >= {min_ratio}x):")
        for d, r, k, a, b in sorted(moved, key=lambda t: -abs(t[0])):
            g = guard.get(k)
            if g and g.get("final", -1) >= 0:
                note = (f"  [guard: fresh-JVM {g['first']:.2f}->{g['final']:.2f}"
                        f" -- survived isolation, real]")
            elif g and g.get("capped"):
                note = ("  [guard: flagged, outside the top-deviator child"
                        " cap -- in-run min kept]")
            elif g:
                note = "  [guard: flagged but fresh pass failed -- unadjudicated]"
            else:
                note = ""
            print(f"  {k:32s} {a:7.2f} -> {b:7.2f}  ({d:+6.2f}s, {r:5.2f}x){note}")
    else:
        print("\nno per-query moves past thresholds")
    only_new = sorted(set(nq) - set(oq))
    only_old = sorted(set(oq) - set(nq))
    if only_new:
        add = sum(nq[k] for k in only_new)
        print(f"\nnew-only queries (+{add:.1f}s): " +
              ", ".join(f"{k}={nq[k]:.2f}" for k in only_new))
    if only_old:
        print("\nremoved queries: " + ", ".join(only_old))
    # uniform-inflation check: median ratio over shared queries
    ratios = sorted(nq[k] / oq[k] for k in shared if oq[k] > 0.05)
    if ratios:
        med = ratios[len(ratios) // 2]
        print(f"\nmedian shared-query ratio: {med:.2f}x "
              f"({'uniform shift - suspect machine/load' if med > 1.2 or med < 0.8 else 'flat'})")


if __name__ == "__main__":
    main()
