"""Per-query bench regression diff: compare two BENCH.json artifacts
(e.g. this round's run vs the last committed one) and report the worst
movers in both directions, plus added/removed queries.

Usage: python scripts/bench_diff.py OLD.json [NEW.json] [--threshold=2.0]

NEW defaults to the repo-root BENCH.json. Exit code 1 if any common
query regressed by more than --threshold x AND by more than 0.5 s
absolute (sub-second queries live in the host-noise band — BASELINE.md
documents +/-15-25% run-to-run there, so a pure ratio gate on them
would cry wolf every round).

When BOTH artifacts carry ``canary_sec`` (bench.py writes it since
round 7), every time is divided by its run's canary first, so a
slower/faster VM between rounds normalizes out and the gate judges the
CODE (the manual host_drift_r6.json A/B, automated).
"""

from __future__ import annotations

import json
import os
import sys


def load(path: str) -> tuple[dict[str, float], float | None]:
    with open(path) as fh:
        payload = json.load(fh)
    if "queries" not in payload:
        return payload, None
    return payload["queries"], payload.get("canary_sec")


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--threshold="):
            threshold = float(a.split("=", 1)[1])
    if not argv:
        print(__doc__)
        return 2
    old_path = argv[0]
    new_path = argv[1] if len(argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.json"
    )
    (old, old_canary), (new, new_canary) = load(old_path), load(new_path)
    # ratio gets canary-normalized (judges the code, not the VM); the
    # absolute +0.5s leg and all displayed times stay in raw seconds.
    host = 1.0
    if old_canary and new_canary:
        host = new_canary / old_canary
        print(
            f"canary old={old_canary:.3f}s new={new_canary:.3f}s "
            f"(host speed ratio {host:.2f}x — ratios normalized by it)"
        )
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    moves = []
    for name in common:
        o, n = old[name], new[name]
        ratio = (n / (o * host)) if o > 0 else float("inf")
        moves.append((ratio, n - o, name, o, n))

    moves.sort(reverse=True)
    print(f"common={len(common)} added={len(added)} removed={len(removed)}")
    total_old = sum(old[n] for n in common)
    total_new = sum(new[n] for n in common)
    ratios = sorted(r for r, *_ in moves)
    median = ratios[len(ratios) // 2] if ratios else float("nan")
    print(
        f"common-total {total_old:.1f}s -> {total_new:.1f}s "
        f"({total_new / total_old:.3f}x), median per-query ratio {median:.3f}"
    )
    print("\nworst regressions:")
    for ratio, delta, name, o, n in moves[:10]:
        if ratio <= 1.0:
            break
        print(f"  {ratio:5.2f}x  {o:7.2f} -> {n:7.2f}  {name}")
    print("\nbest improvements:")
    for ratio, delta, name, o, n in sorted(moves)[:10]:
        if ratio >= 1.0:
            break
        print(f"  {ratio:5.2f}x  {o:7.2f} -> {n:7.2f}  {name}")
    if added:
        print("\nadded: " + ", ".join(f"{n} ({new[n]:.2f}s)" for n in added))
    if removed:
        print("removed: " + ", ".join(removed))

    hard = [
        (ratio, name, o, n)
        for ratio, delta, name, o, n in moves
        if ratio > threshold and delta > 0.5
    ]
    if hard:
        print(f"\nREGRESSIONS above {threshold}x and +0.5s:")
        for ratio, name, o, n in hard:
            print(f"  {ratio:5.2f}x  {o:7.2f} -> {n:7.2f}  {name}")
        return 1
    print(f"\nno regression above {threshold}x and +0.5s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
