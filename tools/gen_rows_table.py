"""Regenerate docs/COVERAGE.md's per-entry newest-driver-row table from
the CORRECTNESS_r*.json history plus the current check window.

Usage: python tools/gen_rows_table.py [--write]

Prints the markdown table between the BEGIN/END markers; with
``--write`` it splices it into docs/COVERAGE.md in place.  An entry is
"green in round k" if its CORRECTNESS_rk row has hash_match (or, for
rows-only entries, rows_match) true; the newest such k wins.  Entries
in the current window are annotated "(window)" — they earn their next
row when the driver next runs; never-checked entries say "local only".
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BEGIN = "| entry | newest driver-green row |"


def newest_rows() -> dict[str, int]:
    newest: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        data = json.loads(f.read_text())
        for name, row in data.items():
            ok = row.get("hash_match") or (
                row.get("hash_match") is None and row.get("rows_match")
            )
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def build_table() -> str:
    from financial_data_stream_processing_engine_spark.plans import catalog

    catalog.load_all()
    names = list(catalog.QUERIES)
    window = set(names[:50])
    newest = newest_rows()
    lines = [BEGIN, "|---|---|"]
    for name in sorted(names):
        r = newest.get(name)
        tag = f"r{r}" if r else "local only (never driver-checked)"
        if name in window:
            tag += " (window)"
        lines.append(f"| `{name}` | {tag} |")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    table = build_table()
    if not args.write:
        print(table)
        return
    doc = (REPO / "docs" / "COVERAGE.md").read_text()
    start = doc.index(BEGIN)
    # table ends at the first non-table line after start
    end = start
    for line in doc[start:].splitlines(keepends=True):
        if line.startswith("|") or line.strip() == "":
            if line.strip() == "" and end > start:
                break
            end += len(line)
        else:
            break
    (REPO / "docs" / "COVERAGE.md").write_text(doc[:start] + table + "\n" + doc[end:])
    print("wrote table into docs/COVERAGE.md")


if __name__ == "__main__":
    main()
