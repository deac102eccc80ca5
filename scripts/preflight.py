#!/usr/bin/env python
"""Pre-snapshot gate: full pytest + full oracle sweep, then a committed
green stamp.

Round-6 shipped two bugs (geo_distance_join antimeridian miss,
benford_prices DECIMAL oracle overflow) via end-of-round commits that
never ran their own checks. This script is the gate: run it before ANY
end-of-round snapshot (or any commit batch that touched operators /
oracles), and commit the stamp it writes — the stamp records the tree
it verified, so a snapshot commit provably post-dates a full green run.

Usage:
    python scripts/preflight.py            # full pytest + all oracles
    python scripts/preflight.py --fast q1 q2 ...
        # pytest -x + only the named oracles (iteration mode; the
        # stamp is only written by the full run)

Writes PREFLIGHT.json on full-green:
    {"tree": <git tree hash>, "head": <commit>, "when": ...,
     "pytest": "...", "oracles": "..."}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, **kw):
    print(f"$ {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, cwd=REPO, **kw)


def main() -> int:
    fast = "--fast" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]

    t0 = time.time()
    pytest_cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
    if fast:
        pytest_cmd.append("-x")
    p = run(pytest_cmd, capture_output=True, text=True)
    py_tail = (p.stdout or "").strip().splitlines()[-1:]
    print("\n".join(py_tail))
    if p.returncode != 0:
        print((p.stdout or "")[-4000:])
        print("PREFLIGHT RED: pytest failed", file=sys.stderr)
        return 1

    oracle_cmd = [sys.executable, "scripts/check_oracle.py", *args]
    o = run(oracle_cmd, capture_output=True, text=True)
    o_tail = (o.stdout or "").strip().splitlines()[-1:]
    print("\n".join(o_tail))
    if o.returncode != 0 or "all green" not in (o.stdout or ""):
        print((o.stdout or "")[-4000:])
        print((o.stderr or "")[-2000:], file=sys.stderr)
        print("PREFLIGHT RED: oracle sweep failed", file=sys.stderr)
        return 1

    if fast or args:
        print(f"PREFLIGHT GREEN (partial, {time.time() - t0:.0f}s) — "
              "no stamp written; run the full sweep before snapshot")
        return 0

    # `git stash create` hashes the WORKING TREE (tracked files as they
    # sit on disk — what pytest actually ran against), unlike
    # `git write-tree`, which hashes the index and is blind to unstaged
    # edits. Empty output = working tree clean = HEAD's tree is what ran.
    stash = subprocess.run(
        ["git", "stash", "create", "preflight"], cwd=REPO,
        capture_output=True, text=True).stdout.strip()
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO,
        capture_output=True, text=True).stdout.strip()
    if stash:
        tree = subprocess.run(
            ["git", "rev-parse", f"{stash}^{{tree}}"], cwd=REPO,
            capture_output=True, text=True).stdout.strip()
        dirty = True
    else:
        tree = subprocess.run(
            ["git", "rev-parse", "HEAD^{tree}"], cwd=REPO,
            capture_output=True, text=True).stdout.strip()
        dirty = False
    # untracked files are invisible even to stash create — record them
    # so a stamp over an incomplete tree is self-describing
    untracked = subprocess.run(
        ["git", "ls-files", "--others", "--exclude-standard"], cwd=REPO,
        capture_output=True, text=True).stdout.strip().splitlines()
    # authoritative registry count (round-8 audit nit: a commit message
    # hand-counted "206" when the registry held 216 — count, don't
    # narrate)
    sys.path.insert(0, REPO)
    import __spark_entry__ as _entry

    n_queries = len({**_entry.queries(), **_entry.extra_queries()})
    stamp = {
        "head": head,
        "tree": tree,
        "dirty_worktree": dirty,
        "untracked": untracked,
        "when": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "elapsed_sec": round(time.time() - t0, 1),
        "pytest": py_tail[0] if py_tail else "",
        "oracles": o_tail[0] if o_tail else "",
        "n_queries": n_queries,
    }
    with open(os.path.join(REPO, "PREFLIGHT.json"), "w") as f:
        json.dump(stamp, f, indent=2)
        f.write("\n")
    print(f"PREFLIGHT GREEN ({stamp['elapsed_sec']}s) — stamp written; "
          "commit PREFLIGHT.json with the snapshot")
    return 0


if __name__ == "__main__":
    sys.exit(main())
