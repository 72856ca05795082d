"""README Results table must track the latest driver benchmark.

VERDICT r04 weak #4: three headline numbers (DR ticks/s, PF realtime
factor, ekf15 heading) drifted across rounds with nothing to catch it.
This test runs scripts/check_readme_numbers.py, which diffs every mapped
README number against the newest BENCH_r*.json within its drift-sized
tolerance.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_matches_latest_bench():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts",
                                      "check_readme_numbers.py")],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
