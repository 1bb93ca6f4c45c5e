"""Driver-window rotation audit (CLAUDE.md invariant, executable).

The driver value-checks only the FIRST 50 queries() entries, so every
row demoted past position 50 must already be green in some prior driver
CORRECTNESS artifact — otherwise a row exists that the driver has NEVER
value-checked ("tail-never-green"). This script recomputes that audit
from the committed CORRECTNESS_r*.json files and the live queries()
order, and reports the staleness (rounds since last driver green) of
every row so the next rotation can promote the oldest.

Exit 1 when any tail row lacks driver-green history.

Usage: python scripts/audit_window.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import __spark_entry__ as E

    names = list(E.queries())
    window, tail = names[:50], names[50:]

    last_green: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        rounds.append(rnd)
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
                last_green[name] = max(last_green.get(name, 0), rnd)
    if not rounds:
        print("no CORRECTNESS_r*.json artifacts found")
        return 1
    cur = max(rounds) + 1  # the round being prepared

    never = [n for n in tail if n not in last_green]
    print(f"artifacts: rounds {rounds}; auditing for round {cur}")
    print(f"window rows: {len(window)}, tail rows: {len(tail)}")

    by_age: dict[int, list[str]] = {}
    for n in names:
        age = cur - last_green[n] if n in last_green else -1
        by_age.setdefault(age, []).append(n)
    for age in sorted(by_age):
        label = "NEVER driver-green" if age < 0 else f"age {age} (last green r{cur - age})"
        in_win = sum(1 for n in by_age[age] if n in set(window))
        print(f"  {label}: {len(by_age[age])} rows ({in_win} in-window)")

    stale_tail = sorted(
        (n for n in tail if n in last_green and cur - last_green[n] > 2),
        key=lambda n: last_green[n],
    )
    if stale_tail:
        print(f"NOTE: {len(stale_tail)} tail rows older than 2 rounds "
              f"(candidates for the next rotation): {stale_tail}")

    if never:
        print(f"FAIL tail-never-green: {never}")
        return 1
    print("OK   tail-never-green is empty: every tail row has driver-green history")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
