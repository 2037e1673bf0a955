#!/usr/bin/env python3
"""Diff two full bench maps (the bench_times.json artifact Bench.scala
writes: {"total_sec":..,"n_queries":..,"n_failed":..,"sf":..,"queries":{..}})
and print the top movers, so cross-round drift is attributable per query
instead of a bare total. Local dev tool only — the engine never depends
on it.

Usage: python3 tools/diff_bench.py OLD.json NEW.json [N]
  N = how many movers to print per direction (default 15).

Output: totals + per-query rate, added/removed queries, then the top N
regressions and improvements by RATIO with the absolute delta alongside
(a 3x move on a 0.1 s query and a 1.2x move on a 10 s query are different
problems; both views matter). Queries under 0.3 s in BOTH maps are
summarized, not listed — at that size the host's scheduling jitter is
larger than any plan change.
"""
import sys, json, signal

# die quietly when piped into `head` instead of tracebacking on SIGPIPE
signal.signal(signal.SIGPIPE, signal.SIG_DFL)

NOISE_FLOOR_SEC = 0.3


def load(path):
    d = json.load(open(path))
    if "queries" not in d:
        sys.exit(f"{path}: not a bench_times map (no 'queries' key)")
    return d


def main(old_path, new_path, top_n=15):
    old, new = load(old_path), load(new_path)
    oq = {k: v for k, v in old["queries"].items() if v >= 0}
    nq = {k: v for k, v in new["queries"].items() if v >= 0}
    print(f"old: {old['total_sec']:8.1f} s / {old['n_queries']} queries "
          f"({old['total_sec']/max(1,old['n_queries']):.3f} s/q)  sf={old.get('sf','?')}")
    print(f"new: {new['total_sec']:8.1f} s / {new['n_queries']} queries "
          f"({new['total_sec']/max(1,new['n_queries']):.3f} s/q)  sf={new.get('sf','?')}")
    # r16: calib-normalized comparison when both maps carry the probe.
    # calib_sec is the median of a fixed CPU-bound spark probe — a pure
    # host-speed unit, so new*cal_old/cal_new removes uniform load drift
    # and what remains is attributable to the tree.
    cal_o, cal_n = old.get("calib_sec"), new.get("calib_sec")
    host = None
    if cal_o and cal_n:
        host = cal_n / cal_o
        print(f"calib: {cal_o:.4f} s -> {cal_n:.4f} s  (host x{host:.3f}; "
              f"normalized new total = {new['total_sec']/host:.1f} s, "
              f"work/calib {old.get('total_per_calib',0):.0f} -> "
              f"{new.get('total_per_calib',0):.0f})")
    of = {k for k, v in old["queries"].items() if v < 0}
    nf = {k for k, v in new["queries"].items() if v < 0}
    if of or nf:
        print(f"failed: old={sorted(of)} new={sorted(nf)}")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}, {sum(nq[k] for k in added):.1f} s): "
              + ", ".join(f"{k}={nq[k]:.2f}" for k in added))
    if removed:
        print(f"removed ({len(removed)}, {sum(oq[k] for k in removed):.1f} s): "
              + ", ".join(f"{k}={oq[k]:.2f}" for k in removed))
    shared = sorted(set(oq) & set(nq))
    delta_shared = sum(nq[k] - oq[k] for k in shared)
    print(f"shared {len(shared)} queries: {sum(oq[k] for k in shared):.1f} s "
          f"-> {sum(nq[k] for k in shared):.1f} s  (delta {delta_shared:+.1f} s)")
    moves = []
    tiny = 0
    for k in shared:
        a, b = oq[k], nq[k]
        if a < NOISE_FLOOR_SEC and b < NOISE_FLOOR_SEC:
            tiny += 1
            continue
        bn = b / host if host else b  # calib-normalized when available
        ratio = bn / a if a > 0 else float("inf")
        moves.append((ratio, bn - a, k, a, bn))
    if tiny:
        print(f"(skipped {tiny} queries under {NOISE_FLOOR_SEC} s both sides)")
    if host:
        print(f"(ratios/deltas below are calib-normalized: new/{host:.3f})")

    def show(title, rows):
        if not rows:
            return
        print(f"\n{title}")
        for ratio, d, k, a, b in rows:
            print(f"  {k:36s} {a:7.2f} -> {b:7.2f} s   {ratio:5.2f}x  {d:+6.2f} s")

    slower = sorted((m for m in moves if m[0] > 1), key=lambda m: -m[0])
    faster = sorted((m for m in moves if m[0] < 1), key=lambda m: m[0])
    show(f"top {top_n} regressions (by ratio)", slower[:top_n])
    show(f"top {top_n} improvements (by ratio)", faster[:top_n])
    by_abs = sorted(moves, key=lambda m: -abs(m[1]))[:top_n]
    show(f"top {top_n} movers (by absolute delta)", by_abs)


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 15)
