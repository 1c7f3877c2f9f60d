#!/usr/bin/env python
"""Second pass over the oracle text hops: guard every VARCHAR→DECIMAL
parse against DuckDB 1.0's scientific-notation parse bug.

DuckDB's CAST(VARCHAR AS DECIMAL(p,s)) mis-parses scientific-notation
text whose value is below 10^-(s+1): CAST('8.9e-15' AS DECIMAL(38,6))
yields 0.000001 instead of 0.000000 (fuzz: 866/4000 wrong in the
sub-1e-7 zone at scale 6, every wrong case a should-be-zero; everything
>= 10^-(s+1) parses exactly, fuzz-verified at scales 2/4/6/9/12).
Tiny residues are exactly what regression slopes and differences-of-
ratios produce (caught live: text_heaps_report beta 0 vs 1e-6 with
constant cum_distinct), so every hop of the form

    CAST({A} AS VARCHAR) AS DECIMAL(p,s)

becomes

    CAST(({A}) * CAST(ABS({A}) >= POWER(10.0, -(s+1)) AS INT)
         AS VARCHAR) AS DECIMAL(p,s)

flushing the broken zone to exact 0 (the correct rounding there is
always 0; the boundary 10^-(s+1) parses correctly on either branch).
Spark's own string→decimal parse is exact, and Spark evaluates the same
guard to the same 0, so dual-compiled fragments stay engine-identical.
Nested hops are guarded innermost-first (fixpoint loop) so the
duplicated operand inside ABS() carries already-guarded inners.

Usage: python scripts/round_guard.py [--dry] file [file ...]
"""
from __future__ import annotations

import pathlib
import re
import sys

HOP = re.compile(r"\bCAST\(")
GUARDED = re.compile(
    r"^\(.*\) \* CAST\(ABS\(.*\) >= POWER\(10\.0, -\(.+\+1\)\) AS INT\)$",
    re.S,
)


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


def find_sites(text: str):
    """Yield (open_idx, close_idx, operand, cast_kw, scale) for every
    CAST(A AS VARCHAR|STRING) AS DECIMAL(p,s) parse in the text."""
    for m in HOP.finditer(text):
        open_idx = m.end() - 1
        close = match_paren(text, open_idx)
        if close < 0:
            continue
        inner = text[open_idx + 1: close]
        tailm = re.search(r" AS (VARCHAR|STRING)$", inner)
        if not tailm:
            continue
        declm = re.match(
            r"\) AS DECIMAL\((\d+)\s*,\s*(\d+|\{[^{}]+\})\)", text[close:]
        )
        if not declm:
            continue
        yield open_idx, close, inner[: tailm.start()], tailm.group(1), declm.group(2)


def transform(text: str, log, fname: str):
    n = 0
    changed = True
    while changed:
        changed = False
        for open_idx, close, a, kw, scale in find_sites(text):
            if GUARDED.match(a.strip()):
                continue
            # innermost-first: postpone if the operand still contains an
            # unguarded hop parse of its own
            if any(
                not GUARDED.match(ia.strip())
                for _, _, ia, _, _ in find_sites(a)
            ):
                continue
            guarded = (
                f"({a}) * CAST(ABS({a}) >= POWER(10.0, -({scale}+1)) AS INT)"
                f" AS {kw}"
            )
            line = text.count("\n", 0, open_idx) + 1
            log.append(f"{fname}:{line} scale={scale} {a[:70]!r}")
            text = text[: open_idx + 1] + guarded + text[close:]
            n += 1
            changed = True
            break
    return text, n


def main() -> int:
    dry = "--dry" in sys.argv
    files = [f for f in sys.argv[1:] if f != "--dry"]
    log: list[str] = []
    total = 0
    for f in files:
        p = pathlib.Path(f)
        t = p.read_text()
        new, n = transform(t, log, f)
        total += n
        if n and not dry:
            p.write_text(new)
    print("\n".join(log[:30]))
    print(f"-- {total} hop parses guarded across {len(files)} files (dry={dry})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
