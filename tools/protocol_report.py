"""Repeatability summary over archived scaling-protocol runs.

VERDICT r4 #3: the build-scaling pass must be REPEATABLE — two
consecutive protocol runs clearing 0.8, not one good window. Each
`tools/bench_scaling.py` invocation archives its raw attempts in
`BENCH/protocol_runs_r5/<tag>.jsonl` and writes BENCH/BASELINE.md for
its own run; this tool re-grades EVERY archived run with the same rule
(per-level MEDIAN across interleaved attempts) and emits a markdown
table to append to BENCH/BASELINE.md.

Usage: python tools/protocol_report.py [archive_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GRADED = [
    ("docs_per_sec", "index build (docs/sec)"),
    ("queries_per_sec_sharded_warm", "sharded-batch query, warm (q/s)"),
    ("queries_per_sec_sharded", "sharded-batch query, cold (q/s)"),
]


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2.0


def grade(path: str) -> dict:
    by = {2: [], 8: []}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if r.get("warmup"):
                continue  # discarded warm-up pair, archived but ungraded
            by[r["cpus"]].append(r)
    out = {"tag": os.path.splitext(os.path.basename(path))[0],
           "attempts": {c: len(rs) for c, rs in by.items()}}
    for key, _ in GRADED:
        try:
            a = _median([r[key] for r in by[2]])
            b = _median([r[key] for r in by[8]])
            out[key] = {"n": a, "4n": b, "eff": round((b / a) / 4.0, 3)}
        except KeyError:
            out[key] = None
    return out


def grade_pooled(paths: list[str]) -> dict:
    """BASELINE.md pooled-grading rule (round 6, VERDICT r5 #7): per-level
    median POOLED over the graded attempts of several engine-identical
    runs. Per-run medians stay disclosed next to it; this is the round's
    graded number."""
    by = {2: [], 8: []}
    for path in paths:
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                if r.get("warmup"):
                    continue
                by[r["cpus"]].append(r)
    out = {"tags": [os.path.splitext(os.path.basename(p))[0] for p in paths],
           "attempts": {c: len(rs) for c, rs in by.items()}}
    for key, _ in GRADED:
        a = _median([r[key] for r in by[2]])
        b = _median([r[key] for r in by[8]])
        out[key] = {"n": round(a, 2), "4n": round(b, 2),
                    "eff": round((b / a) / 4.0, 3)}
    return out


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH", "protocol_runs_r5"
    )
    pool_tags = [t for t in sys.argv[2:]]  # e.g. runE runF: final-engine runs
    runs = [grade(p) for p in sorted(glob.glob(os.path.join(arch, "*.jsonl")))]
    if not runs:
        print(f"no archived runs under {arch}", file=sys.stderr)
        sys.exit(1)
    lines = [
        "## Repeatability across consecutive protocol runs (VERDICT r4 #3)",
        "",
        "Every archived protocol run re-graded with the same rule",
        "(per-level median over interleaved attempts). The criterion is",
        "two consecutive runs with build efficiency >= 0.8:",
        "",
        "| run | attempts/level | build eff | sharded warm eff | sharded cold eff |",
        "|---|---|---|---|---|",
    ]
    for r in runs:
        b = r["docs_per_sec"]
        w = r["queries_per_sec_sharded_warm"]
        c = r["queries_per_sec_sharded"]
        lines.append(
            f"| {r['tag']} | {r['attempts'][2]}x2 / {r['attempts'][8]}x8 "
            f"| **{b['eff']}** ({b['n']} → {b['4n']}) "
            f"| {w['eff'] if w else '—'} | {c['eff'] if c else '—'} |"
        )
    builds = [r["docs_per_sec"]["eff"] for r in runs]
    consec = all(e >= 0.8 for e in builds[-2:]) and len(builds) >= 2
    lines += [
        "",
        f"Build efficiencies in run order: {builds} → two consecutive "
        f"runs ≥ 0.8: {'**PASS**' if consec else '**FAIL**'}.",
    ]
    if pool_tags:
        paths = [os.path.join(arch, f"{t}.jsonl") for t in pool_tags]
        p = grade_pooled(paths)
        lines += [
            "",
            "### Pooled grading over the final-engine runs "
            f"({', '.join(p['tags'])}) — the round's GRADED values",
            "",
            f"{p['attempts'][2]} attempts at local[2], {p['attempts'][8]} "
            "at local[8], pooled per BASELINE.md's round-6 rule (stated "
            "before these runs executed; no steal-based exclusion):",
            "",
            "| metric | local[2] pooled median | local[8] pooled median "
            "| efficiency | ≥0.8 |",
            "|---|---|---|---|---|",
        ]
        for key, label in GRADED:
            g = p[key]
            verdict = "**PASS**" if g["eff"] >= 0.8 else "**FAIL**"
            lines.append(
                f"| {label} | {g['n']} | {g['4n']} | **{g['eff']}** "
                f"| {verdict} |"
            )
    print("\n".join(lines))


if __name__ == "__main__":
    main()
