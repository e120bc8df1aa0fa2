#!/usr/bin/env python3
"""Time-vs-SF slope report (VERDICT r12 task 1).

Compares two graft.Bench sweeps -- a small-SF baseline and a larger-SF
run -- and reports the per-query time ratio against the data-scale
ratio. A query whose time grows much faster than the data (ratio >>
scale) is super-linear and gets flagged; sub-scale ratios are normal
(fixed per-query overhead -- session setup, planning, small shuffles --
dominates at these sizes).

Usage: python3 tools/slope_report.py <bench_small.json> <bench_big.json> <scale> [out.md]
"""
import json
import sys


def main() -> int:
    small_path, big_path, scale = sys.argv[1], sys.argv[2], float(sys.argv[3])
    out_path = sys.argv[4] if len(sys.argv) > 4 else None
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    sq, bq = small["queries"], big["queries"]
    common = sorted(set(sq) & set(bq))
    missing = sorted(set(sq) ^ set(bq))
    rows = []
    for q in common:
        s, b = sq[q], bq[q]
        ratio = b / s if s > 0 else float("inf")
        rows.append((q, s, b, ratio))
    rows.sort(key=lambda r: -r[3])

    # flag: super-linear means time grew faster than the data did,
    # with a 1.5x grace factor and an absolute floor (a 0.05s->0.8s
    # query is overhead noise, not a scaling problem)
    flagged = [r for r in rows if r[3] > 1.5 * scale and r[2] > 2.0]

    lines = []
    lines.append(f"# Bench slope report: {small_path} -> {big_path} (data x{scale:g})")
    lines.append("")
    lines.append(f"- queries compared: {len(common)}"
                 + (f" (asymmetric: {missing})" if missing else ""))
    lines.append(f"- total time: {sum(r[1] for r in rows):.1f}s -> "
                 f"{sum(r[2] for r in rows):.1f}s "
                 f"({sum(r[2] for r in rows)/max(sum(r[1] for r in rows),1e-9):.2f}x "
                 f"on {scale:g}x data)")
    med = sorted(r[3] for r in rows)[len(rows)//2] if rows else 0.0
    lines.append(f"- median per-query ratio: {med:.2f}x")
    lines.append(f"- flagged super-linear (> {1.5*scale:g}x and > 2s): {len(flagged)}")
    lines.append("")
    lines.append("## Slowest-growing 25 queries")
    lines.append("")
    lines.append("| query | small (s) | big (s) | ratio |")
    lines.append("|---|---|---|---|")
    for q, s, b, r in rows[:25]:
        mark = " **FLAG**" if (q, s, b, r) in flagged else ""
        lines.append(f"| {q}{mark} | {s:.3f} | {b:.3f} | {r:.2f}x |")
    lines.append("")
    lines.append("## Flagged queries")
    lines.append("")
    if flagged:
        for q, s, b, r in flagged:
            lines.append(f"- {q}: {s:.3f}s -> {b:.3f}s ({r:.2f}x on {scale:g}x data)")
    else:
        lines.append(f"(none -- every query grew at or below {1.5*scale:g}x "
                     f"on {scale:g}x data, or stays under 2s)")
    text = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
    print(text)
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
