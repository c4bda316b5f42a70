"""Same-day A/B bench: the current tree vs a FROZEN anchor snapshot.

The headline total drifted upward three rounds running (r7 14.62s →
r8 15.79s → r9 17.36s) on near-identical query code; r8 proved its
share of the drift was ambient host load by re-benching the unchanged
r7 snapshot the same day. This script makes that control a per-round
artifact instead of a one-off: it checks the anchor commit out into a
scratch worktree, runs ITS bench.py and the current bench.py in the
same measurement window (fresh process each, same env), and writes
``BENCH_AB_r{N}.json`` with both runs plus per-query current/anchor
ratios over the common query set. A query whose ratio is ~1.0 drifted
with the host; a ratio well above 1.0 in the SAME window is a real,
code-attributable regression.

Usage: python scripts/bench_ab.py [anchor_commit] [round_tag]
       (defaults: 5bf7bf2 — the r11-grade snapshot — and r12)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tree: str) -> dict:
    """Run ``python bench.py`` in ``tree`` (fresh process) and parse
    the single JSON stdout line."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # each tree resolves its own package
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    anchor = sys.argv[1] if len(sys.argv) > 1 else "5bf7bf2"
    tag = sys.argv[2] if len(sys.argv) > 2 else "r12"
    wt = os.path.join(REPO, ".scratch", f"anchor_{anchor}")
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, anchor],
            cwd=REPO,
            check=True,
        )
    print(f"# benching anchor {anchor} …", file=sys.stderr)
    a = run_bench(wt)
    print(f"# benching current tree …", file=sys.stderr)
    c = run_bench(REPO)

    common = sorted(set(a["queries"]) & set(c["queries"]))
    ratios = {
        q: round(c["queries"][q] / a["queries"][q], 3) for q in common
    }
    a_total = round(sum(a["queries"][q] for q in common), 4)
    c_total = round(sum(c["queries"][q] for q in common), 4)
    report = {
        "anchor_commit": anchor,
        "anchor": a,
        "current": c,
        "common_set_total": {
            "anchor": a_total,
            "current": c_total,
            "ratio": round(c_total / a_total, 3),
        },
        "ratio_current_over_anchor": ratios,
        "note": (
            "Same measurement window, same machine, fresh process per "
            "tree. Ratios ~1.0 = host drift; >1.1 sustained = "
            "code-attributable regression on that query."
        ),
    }
    path = os.path.join(REPO, f"BENCH_AB_{tag}.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(f"# wrote {path}", file=sys.stderr)
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:5]
    for q, r in worst:
        print(
            f"# {q}: anchor={a['queries'][q]:.3f}s "
            f"current={c['queries'][q]:.3f}s ratio={r}",
            file=sys.stderr,
        )
    print(json.dumps(report["common_set_total"]))


if __name__ == "__main__":
    main()
