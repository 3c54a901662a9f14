"""Full headline bench at TWO scale factors (VERDICT r10 #7): run the
whole bench.py suite at sf0.1 and at a structure-preserving 10x
amplification ("sf1", scripts/sf1_scaling._amplify — fact tables and
corpora scaled, dimensions kept, near-dup pair density preserved), and
record per-query per-decade time exponents so the match-or-beat
contract is evidenced at two scales and any super-linear query is
visible by name.

Each bench run is a FRESH subprocess (same entry the driver uses), so
JVM/session state never leaks between scales.  Usage:

    python scripts/bench_sf1.py [out_json] [sf1_dir]

Writes `artifacts/BENCH_sf1_round11.json` by default and prints the
markdown exponent table (PLANS.md carries the committed copy).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"


def _run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    out_json = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "artifacts", "BENCH_sf1_round11.json")
    )
    sf1 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        tempfile.gettempdir(), "spark_graft_sf1"
    )
    if not os.path.exists(f"{sf1}/lineitem.parquet"):
        from dl_datalake_spark.session import get_spark
        from scripts.sf1_scaling import _amplify

        spark = get_spark("bench-sf1-amplify")
        t0 = time.time()
        _amplify(spark, sf1)
        print(f"# amplified sf0.1 x10 -> {sf1} in {time.time() - t0:.1f}s")
        spark.stop()

    b01 = _run_bench(SRC)
    b1 = _run_bench(sf1)
    rows = {}
    for q, t0 in b01["queries"].items():
        t1 = b1["queries"].get(q)
        if t1 is None:
            continue
        exp = round(math.log10(t1 / t0), 2) if t0 > 0 and t1 > 0 else None
        rows[q] = {"sf0.1_s": t0, "sf1_s": t1, "time_exp_per_decade": exp}
    artifact = {
        "suite_sf0.1_s": b01["value"],
        "suite_sf1_s": b1["value"],
        "suite_exp_per_decade": round(math.log10(b1["value"] / b01["value"]), 2),
        "sf1_dir": sf1,
        "queries": rows,
    }
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact))
    print("\n| query | t sf0.1 (s) | t sf1 (s) | time exp/decade |")
    print("|---|---|---|---|")
    for q, r in sorted(rows.items(), key=lambda kv: -(kv[1]["time_exp_per_decade"] or 0)):
        print(f"| {q} | {r['sf0.1_s']} | {r['sf1_s']} | {r['time_exp_per_decade']} |")
    print(
        f"\nSuite: {artifact['suite_sf0.1_s']} s -> {artifact['suite_sf1_s']} s "
        f"(exp {artifact['suite_exp_per_decade']}/decade)"
    )


if __name__ == "__main__":
    main()
