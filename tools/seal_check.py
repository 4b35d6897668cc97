"""Seal gate: refuse to record BENCH/SCALE seal numbers while PLANS.md
is stale (round-9 VERDICT #4 — PLANS.md shipped stale three rounds
running because regeneration happened mid-round and coding continued).

PLANS.md's header records the commit it was generated at
(tools/plan_report.py). "Current" does NOT mean that commit == HEAD —
doc-only commits after regeneration cannot change a physical plan — it
means nothing that AFFECTS plans moved since:

- the recorded commit is an ancestor of HEAD,
- no commit since touches the plan-bearing paths
  (lakehouse_dba_tools_spark/, __spark_entry__.py, bench.py),
- and those paths carry no uncommitted changes.

bench.py consults this check when SPARK_GRAFT_SEAL=1 (the builder's
seal runs) and exits without timing anything on a stale PLANS.md; the
driver's plain `python bench.py` is unaffected — its numbers are
recorded by the driver, not by the seal flow, and the bench JSON line
must always print for it.

Usage: python tools/seal_check.py   (exit 0 = sealable, 2 = stale)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

PLAN_PATHS = ("lakehouse_dba_tools_spark", "__spark_entry__.py", "bench.py")
_COMMIT_RE = re.compile(r"commit `([0-9a-f]{7,40})`")


def plans_commit(plans_path: str) -> str | None:
    """The commit sha recorded in PLANS.md's header, or None for a
    pre-round-10 PLANS.md that predates the stamp."""
    try:
        with open(plans_path) as fh:
            head = fh.read(2000)
    except OSError:
        return None
    m = _COMMIT_RE.search(head)
    return m.group(1) if m else None


def _git(repo_dir: str, *args: str) -> tuple[int, str]:
    p = subprocess.run(
        ["git", "-C", repo_dir, *args], capture_output=True, text=True
    )
    return p.returncode, p.stdout.strip()


def check_plans_current(repo_dir: str, plans_path: str | None = None) -> tuple[bool, str]:
    """(ok, reason). ok=False means seal numbers must not be recorded."""
    plans_path = plans_path or os.path.join(repo_dir, "PLANS.md")
    sha = plans_commit(plans_path)
    if sha is None:
        return False, (
            f"{plans_path} records no generation commit — regenerate it "
            f"with tools/plan_report.py (which stamps the commit) and "
            f"commit it before sealing"
        )
    rc, _ = _git(repo_dir, "merge-base", "--is-ancestor", sha, "HEAD")
    if rc != 0:
        return False, (
            f"PLANS.md was generated at {sha}, which is not an ancestor of "
            f"HEAD — regenerate and commit it"
        )
    rc, moved = _git(repo_dir, "diff", "--name-only", f"{sha}..HEAD", "--", *PLAN_PATHS)
    if rc != 0:
        return False, f"git diff {sha}..HEAD failed"
    if moved:
        return False, (
            f"plan-bearing paths changed since PLANS.md was generated at "
            f"{sha}: {moved.splitlines()[:5]} — regenerate PLANS.md, commit "
            f"it, then seal"
        )
    rc, dirty = _git(repo_dir, "status", "--porcelain", "--", *PLAN_PATHS)
    if rc != 0:
        return False, "git status failed"
    if dirty:
        return False, (
            f"plan-bearing paths have uncommitted changes: "
            f"{dirty.splitlines()[:5]} — commit (or revert), regenerate "
            f"PLANS.md if they moved plans, then seal"
        )
    return True, f"PLANS.md current as of {sha}; no plan-bearing drift to HEAD"


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ok, reason = check_plans_current(repo)
    print(("SEALABLE: " if ok else "STALE: ") + reason)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
