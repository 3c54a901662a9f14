"""Round-close invariant (VERDICT r3 task 2).

Regenerates the sf0.1 correctness artifact as the LAST act of a round and
asserts the artifact covers the FULL registry: round 3 shipped a 157-query
log against a 161-query registry because four queries landed after the log
was generated.  This script makes that impossible to repeat silently —
the artifact line count is checked against ``len(queries())`` and the
process exits non-zero on any shortfall or failure.

Usage:
    python scripts/round_close.py <round_number> [sf_dir]

Writes artifacts/correctness_sf<scale>_round<N>.log and prints a one-line
verdict.  Run this before the final commit of every round.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: round_close.py <round_number> [sf_dir]", file=sys.stderr)
        return 2
    round_no = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    scale = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from __spark_entry__ import queries

    registry_n = len(queries())

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_correctness.py"), sf_dir],
        capture_output=True,
        text=True,
    )
    out = proc.stdout
    artifact = os.path.join(REPO, "artifacts", f"correctness_sf{scale}_round{round_no}.log")
    os.makedirs(os.path.dirname(artifact), exist_ok=True)
    # keep only the per-query verdict lines + summary (drop Spark log noise)
    lines = [
        ln
        for ln in out.replace("\r", "\n").splitlines()
        if re.match(r"^(OK|FAIL|rows-only)\s", ln) or "passed" in ln
    ]
    with open(artifact, "w") as fh:
        fh.write("\n".join(lines) + f"\nexit={proc.returncode}\n")

    logged = sum(1 for ln in lines if re.match(r"^(OK|FAIL|rows-only)\s", ln))
    ok = sum(1 for ln in lines if ln.startswith("OK ") or ln.startswith("rows-only"))
    problems = []
    if proc.returncode != 0:
        problems.append(f"check_correctness exit={proc.returncode}")
    if logged != registry_n:
        problems.append(f"artifact covers {logged}/{registry_n} registry queries")
    if problems:
        print(f"ROUND-CLOSE FAIL: {'; '.join(problems)}  ({artifact})")
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-2000:])
        return 1
    print(f"ROUND-CLOSE OK: {ok}/{registry_n} queries green at {sf_dir} -> {artifact}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
