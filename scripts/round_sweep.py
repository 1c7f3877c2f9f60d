#!/usr/bin/env python
"""Inventory every ROUND( site in the package's DuckDB oracle strings and
classify its rounding-tie exposure (VERDICT r8 item 1).

DuckDB's ROUND(double, n) rounds in float arithmetic and can differ from
Spark's exact shortest-repr HALF_UP by 1 ulp at .5 boundaries; ROUND on a
DECIMAL operand is exact in both engines and carries no hazard. This
script paren-matches each site, extracts (operand, scale), and buckets:

  DECIMAL  — operand's outermost cast is AS DECIMAL/NUMERIC: exact, safe
  DOUBLE   — operand is double-typed (AS DOUBLE cast or float division):
             exposed; convert to _qround_sql's text hop
  OTHER    — needs eyes

Usage: python scripts/round_sweep.py [--json]
"""
from __future__ import annotations

import json
import pathlib
import re
import sys

PKG = pathlib.Path(__file__).resolve().parent.parent / "bullet_storm_spark"


def match_paren(text: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


def split_args(inner: str) -> list[str]:
    args, depth, cur = [], 0, []
    for ch in inner:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    args.append("".join(cur).strip())
    return args


def classify(operand: str) -> str:
    up = operand.upper()
    # outermost cast decides the type of the whole operand
    if re.match(r"^CAST\(", up) and match_paren(up, 4) == len(up) - 1:
        tail = up[: len(up) - 1].rstrip()
        if re.search(r"AS\s+(DECIMAL|NUMERIC)[^)]*$", tail):
            return "DECIMAL"
        if re.search(r"AS\s+DOUBLE\s*$", tail):
            return "DOUBLE"
    if "AS DOUBLE" in up or "/" in up or "EXP(" in up or "LN(" in up or "SQRT(" in up:
        return "DOUBLE"
    if "AS DECIMAL" in up:
        return "OTHER"
    return "OTHER"


def main() -> int:
    sites = []
    for path in sorted(PKG.rglob("*.py")):
        text = path.read_text()
        for m in re.finditer(r"\bROUND\(", text):
            end = match_paren(text, m.end() - 1)
            if end < 0:
                continue
            inner = text[m.end(): end]
            args = split_args(inner)
            line = text.count("\n", 0, m.start()) + 1
            if len(args) < 2:
                kind = "NO_SCALE"
            else:
                kind = classify(args[0])
            sites.append(
                {
                    "file": str(path.relative_to(PKG.parent)),
                    "line": line,
                    "kind": kind,
                    "scale": args[1] if len(args) > 1 else None,
                    "operand": args[0][:120],
                }
            )
    if "--json" in sys.argv:
        print(json.dumps(sites, indent=1))
    else:
        from collections import Counter

        print(Counter(s["kind"] for s in sites))
        for s in sites:
            if s["kind"] in ("DOUBLE", "OTHER"):
                print(f"{s['file']}:{s['line']} [{s['kind']}] scale={s['scale']} {s['operand']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
