"""Run the full oracle-parity suite at driver scale (sf0.01) and
record the outcome in ORACLE_PARITY_SF001.txt — the committed marker
that proves the pre-round sweep actually ran at the scale the driver
verifies at (COVERAGE.md: sf0.001 passes do not guarantee sf0.01;
row-count-dependent paths like LSH banding produce different candidate
sets).

Usage: python tools/record_oracle_parity.py
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"


def main() -> int:
    env = dict(os.environ, SPARK_GRAFT_ORACLE_SF=SF)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_oracle_parity.py",
         "-q", "--tb=no"],
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    tail = (proc.stdout.strip().splitlines() or [""])[-1]
    sha = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    m = re.search(r"(\d+) passed", tail)
    n_pass = int(m.group(1)) if m else 0
    failed = "failed" in tail or proc.returncode != 0
    with open(os.path.join(REPO, "ORACLE_PARITY_SF001.txt"), "w") as fh:
        fh.write(
            f"suite: tests/test_oracle_parity.py\n"
            f"sf_dir: {SF}\n"
            f"result: {tail}\n"
            f"passed: {n_pass}\n"
            f"clean: {not failed}\n"
            f"git_sha: {sha}\n"
        )
    print(tail)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
