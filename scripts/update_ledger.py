#!/usr/bin/env python
"""Regenerate datacamp_etl_spark/adjudication.py from CORRECTNESS_r*.json.

Run at the start of each round (after the driver commits the previous
round's CORRECTNESS file) so the registry window rotation orders stale
entries correctly. Records the LAST round each entry appeared in a
driver adjudication window, regardless of pass/fail -- a failed check
is still a fresh check; the fix ships and re-enters via the rotation.
"""
from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOC = '''"""Driver-adjudication ledger: last round each registry entry was
oracle-checked by the round driver (from CORRECTNESS_r*.json).

Regenerate each round with scripts/update_ledger.py -- run it right
after a new CORRECTNESS_r{N}.json lands so the next round's window
rotation (queries._rotation_order) sees fresh staleness data.
Entries absent from this dict have never been driver-adjudicated
and are promoted to the very front of the registry."""

LAST_ADJUDICATED: dict[str, int] = {
'''


def main() -> None:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for k in json.load(open(f)):
            last[k] = rnd
    body = "".join(f'    "{k}": {last[k]},\n' for k in sorted(last))
    out = os.path.join(REPO, "datacamp_etl_spark", "adjudication.py")
    with open(out, "w") as fh:
        fh.write(DOC + body + "}\n")
    print(f"wrote {len(last)} entries -> {out}")


if __name__ == "__main__":
    main()
