#!/usr/bin/env python3
"""Compare two bench artifacts (BENCH_LOCAL.json / BENCH_r{N}.json) and
flag per-query regressions in wall-clock and shuffle bytes.

Usage: python scripts/bench_compare.py OLD.json NEW.json [--wall-tol 1.3]
       [--shuffle-tol 1.2] [--shuffle-only]

The required per-round gate compares against the pinned manifest and
ignores wall-clock entirely (boot envelope is +/-15-25% on this box):
    python scripts/bench_compare.py SHUFFLE_MANIFEST.json NEW.json \
        --shuffle-only --shuffle-tol 1.2

Wall-clock is noisy (JIT, page cache), so the default tolerance is 30%;
shuffle bytes are deterministic for a fixed SF, so 20% growth there is a
plan-shape change worth reading the explain output for. Exit code 1 when
any regression is flagged (usable as a CI gate).
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    # BENCH_r{N}.json wraps the engine line in a driver envelope
    d = json.loads(text)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--wall-tol", type=float, default=1.3)
    ap.add_argument("--shuffle-tol", type=float, default=1.2)
    ap.add_argument("--shuffle-only", action="store_true",
                    help="gate on shuffle bytes + spill only (skip the "
                         "noisy wall-clock check)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)

    # driver artifacts key queries by the short qNN prefix, the full local
    # artifact by complete names — normalize both to the qNN prefix
    def norm(m):
        return {k.split("_")[0]: v for k, v in m.items()}

    oq, nq = norm(old.get("queries", {})), norm(new.get("queries", {}))
    osh = norm(old.get("shuffle_bytes", {}))
    nsh = norm(new.get("shuffle_bytes", {}))
    # percentile columns (serving family carries p90 of >=3 in-process
    # repeats since r13): when both artifacts have a query's p90, gate on
    # the percentile instead of the single-shot wall — repeats average out
    # the boot envelope, so a p90 regression is a real one
    op90 = norm(old.get("p90", {}))
    np90 = norm(new.get("p90", {}))

    flagged = []
    common = sorted(set(oq) & set(nq))
    # gate over wall-common AND p90-common queries: driver compact
    # artifacts truncate "queries" to the top-25 most expensive, so the
    # (sub-second) serving family only appears in "p90" — iterating the
    # wall intersection alone would silently skip exactly the queries
    # the percentile columns exist for
    gated = sorted((set(oq) & set(nq)) | (set(op90) & set(np90)))
    for q in gated if not args.shuffle_only else []:
        if q in op90 and q in np90:
            if np90[q] > args.wall_tol * max(op90[q], 0.1):
                flagged.append(
                    f"P90     {q}: {op90[q]:.2f}s -> {np90[q]:.2f}s "
                    f"({np90[q] / op90[q]:.2f}x)")
            continue
        # sub-half-second queries are scheduling/GC noise at local[32]
        if oq[q] > 0.5 and nq[q] > args.wall_tol * oq[q]:
            flagged.append(
                f"WALL    {q}: {oq[q]:.2f}s -> {nq[q]:.2f}s "
                f"({nq[q] / oq[q]:.2f}x)")
    for q in sorted(set(osh) & set(nsh)):
        ow = osh[q].get("write", 0)
        nw = nsh[q].get("write", 0)
        if ow > 1 << 20 and nw > args.shuffle_tol * ow:
            flagged.append(
                f"SHUFFLE {q}: {ow / 1e6:.1f}MB -> {nw / 1e6:.1f}MB written "
                f"({nw / ow:.2f}x)")
        osp = osh[q].get("spill", 0)
        nsp = nsh[q].get("spill", 0)
        if nsp > 0 and osp == 0:
            flagged.append(f"SPILL   {q}: 0 -> {nsp / 1e6:.1f}MB")

    print(f"queries: {len(common)} common, "
          f"{len(set(nq) - set(oq))} new, {len(set(oq) - set(nq))} removed"
          f" ({len(set(op90) & set(np90))} gated on p90)")
    print(f"total: {old.get('value', '?')}s -> {new.get('value', '?')}s")
    if flagged:
        print("\nregressions:")
        for line in flagged:
            print("  " + line)
        sys.exit(1)
    print("no regressions flagged")


if __name__ == "__main__":
    main()
