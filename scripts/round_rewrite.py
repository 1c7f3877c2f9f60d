#!/usr/bin/env python
"""One-shot mechanical rewrite of DuckDB-oracle ROUND(double, n) sites to
the engine-exact text hop (VERDICT r8 item 1 — the ROUND tie-divergence
hazard class).

ROUND(A, S)  ->  CAST(CAST(CAST(CAST(A AS VARCHAR) AS DECIMAL(38,S))
                 AS VARCHAR) AS DOUBLE)

Spark's F.round(double, n) is exact shortest-repr HALF_UP; DuckDB's ROUND
rounds in float arithmetic, 1-ulp divergent at .5 boundaries depending on
build. The hop reproduces Spark's rounding bit-for-bit. Innermost-first so
nested ROUNDs resolve; scale must look like an int literal or a format
placeholder so prose mentions of ROUND(...) in docstrings survive.

Usage: python scripts/round_rewrite.py [--dry] file [file ...]
"""
from __future__ import annotations

import pathlib
import re
import sys


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


def split_two(inner: str):
    depth = 0
    for i, ch in enumerate(inner):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            return inner[:i], inner[i + 1:]
    return None


SCALE_OK = re.compile(r"^(\d+|\{[^{}]+\}|\{\{[^}]+\}\})$")


def rewrite(text: str, log, fname: str):
    changed = True
    n = 0
    while changed:
        changed = False
        for m in re.finditer(r"\bROUND\(", text):
            end = match_paren(text, m.end() - 1)
            if end < 0:
                continue
            inner = text[m.end(): end]
            if "ROUND(" in inner:
                continue  # resolve innermost first
            parts = split_two(inner)
            if parts is None:
                continue
            a, s = parts[0].strip(), parts[1].strip()
            if not SCALE_OK.match(s):
                continue
            new = (
                f"CAST(CAST(CAST(CAST({a} AS VARCHAR) AS DECIMAL(38,{s})) "
                f"AS VARCHAR) AS DOUBLE)"
            )
            line = text.count("\n", 0, m.start()) + 1
            log.append(f"{fname}:{line} scale={s} {a[:80]!r}")
            text = text[: m.start()] + new + text[end + 1:]
            changed = True
            n += 1
            break
    return text, n


def main() -> int:
    dry = "--dry" in sys.argv
    files = [a for a in sys.argv[1:] if a != "--dry"]
    log: list[str] = []
    total = 0
    for f in files:
        p = pathlib.Path(f)
        text = p.read_text()
        new, n = rewrite(text, log, f)
        total += n
        if n and not dry:
            p.write_text(new)
    print("\n".join(log))
    print(f"-- {total} sites rewritten across {len(files)} files (dry={dry})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
