"""One-time generator for ``tools/rotation_snapshots/r0N.json``.

For each grading-round close commit (``tools.rotation.ROUND_CLOSE``),
checks the rev out into a throwaway ``git worktree``, imports that
rev's ``contract`` module, and dumps:

- ``oracles``: the fully-built ORACLES dict (name -> SQL text) — oracle
  strings are assembled with f-strings/concatenation, so the only
  faithful extraction is the live dict;
- ``roots``: name -> the registered function's qualname, so a query
  silently rebound to a different implementation is detected.

Snapshots of immutable revs are themselves immutable, so they are
committed; ``tools/rotation.py`` diffs the live contract against them
at test time with no git/worktree cost. When a new round closes, add
its commit to ``ROUND_CLOSE`` and run this script again (it skips
snapshots that already exist).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from tools.rotation import REPO, ROUND_CLOSE  # noqa: E402

SNAP_DIR = REPO / "tools" / "rotation_snapshots"

_DUMP = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from uk_housing_dashboard_etl_spark import contract
out = {
    "oracles": dict(contract.ORACLES),
    "roots": {n: f.__qualname__ for n, f in contract.QUERIES.items()},
}
json.dump(out, open(sys.argv[2], "w"), indent=0, sort_keys=True)
"""


def snapshot(round_no: int, rev: str) -> None:
    dst = SNAP_DIR / f"r{round_no:02d}.json"
    if dst.exists():
        print(f"r{round_no:02d}: exists, skipping")
        return
    wt = REPO / f".rotation_wt_r{round_no:02d}"
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(wt), rev],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        subprocess.run(
            [sys.executable, "-c", _DUMP, str(wt), str(dst)],
            check=True,
        )
        print(f"r{round_no:02d}: wrote {dst.name}")
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(wt)],
            cwd=REPO, check=True, capture_output=True,
        )


def main() -> None:
    SNAP_DIR.mkdir(exist_ok=True)
    for round_no, rev in sorted(ROUND_CLOSE.items()):
        snapshot(round_no, rev)


if __name__ == "__main__":
    main()
