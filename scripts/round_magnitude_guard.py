#!/usr/bin/env python
"""Third pass over the oracle ROUND text hops: bound the DECIMAL(38,d)
parse away from its overflow zone (ADVICE r9).

DuckDB's CAST(VARCHAR AS DECIMAL(38,d)) RAISES (ConversionException) on
|x| >= 10^(38-d) and on NaN/Inf text rather than returning a value, so
a ROUND hop over an unbounded operand (MIN/MAX profiles, raw sums)
turns an oracle comparison into a hard query error on extreme data.
The fix exploits that every double with |x| >= 2^52 is integer-valued:
Spark's Round (BigDecimal shortest-repr, setScale(d >= 0, HALF_UP)) is
the IDENTITY there, so the oracle may return x directly above a 1e16
threshold (> 2^53, far below the tightest overflow bound 10^(38-12) =
1e26 in use) with bit-identical results. Every hop of the form

    CAST(CAST(CAST(CAST((A) * CAST(ABS(A') >= POWER(10.0, -(d+1)) AS INT)
         AS VARCHAR) AS DECIMAL(38,d)) AS VARCHAR) AS DOUBLE)

becomes

    CASE WHEN ABS(A) >= 1e16 THEN CAST((A) AS DOUBLE) ELSE <hop> END

The CASE branch also absorbs NaN/Inf (DuckDB orders NaN above all
values; Spark's Round returns NaN/Inf unchanged) and NULL falls through
to the hop, which propagates it. Innermost-first fixpoint so a hop
duplicated into a wrapper's ABS()/THEN operands is itself guarded
(otherwise evaluating the CASE condition would still raise).

Usage: python scripts/round_magnitude_guard.py [--dry] file [file ...]
"""
from __future__ import annotations

import pathlib
import re
import sys

START = re.compile(r"CAST\(CAST\(CAST\(CAST\(\(")
# the whole tail must live inside ONE string literal: any quote or newline
# in the match means it crossed a literal/site boundary (the first version
# of this pass allowed that and spliced END into unrelated literals)
SCALE = r"(\d+|\{[^{}\"'\n]+\}|\{\{[^}\"'\n]+\}\})"
TAIL_AFTER_ABS = re.compile(
    r"^ >= POWER\(10\.0, -\(" + SCALE + r"\+1\)\) AS INT\)"
    r" AS VARCHAR\) AS DECIMAL\(38," + SCALE + r"\)\) AS VARCHAR\) AS DOUBLE\)"
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


def find_site(text: str, from_idx: int = 0):
    """Return (start, end, operand) of the first unguarded full ROUND hop
    at or after from_idx, else None. ``end`` is exclusive."""
    for m in START.finditer(text, from_idx):
        a_open = m.end() - 1
        a_close = match_paren(text, a_open)
        if a_close < 0:
            continue
        operand = text[a_open : a_close + 1]  # includes parens
        if '"' in operand or "'" in operand or "\n" in operand:
            # operand crosses a string-literal boundary; duplicating it
            # into the CASE condition would splice quote/format junk into
            # the SQL — leave such (rare, hand-audited) sites alone
            continue
        # the ABS() group is matched PAREN-BALANCED, never by regex: on
        # nested same-shaped sites a lazy regex binds to an inner ') >='
        # and splices END after the wrong AS DOUBLE) (corrupted
        # sessionize_sql before this was procedural)
        mid = " * CAST(ABS"
        if text[a_close + 1 : a_close + 1 + len(mid)] != mid:
            continue
        abs_open = a_close + 1 + len(mid)
        if abs_open >= len(text) or text[abs_open] != "(":
            continue
        abs_close = match_paren(text, abs_open)
        if abs_close < 0:
            continue
        abs_arg = text[abs_open : abs_close + 1]
        if '"' in abs_arg or "'" in abs_arg or "\n" in abs_arg:
            continue
        tail = TAIL_AFTER_ABS.match(text[abs_close + 1 :])
        if not tail:
            continue
        end = abs_close + 1 + tail.end()
        # skip sites already wrapped (ELSE <hop> END), tolerating f-string
        # quote/prefix/whitespace junk between the keywords and the hop
        junk = '"\'fF \n\t('
        before = text[max(0, m.start() - 24) : m.start()].rstrip(junk)
        after = text[end : end + 24].lstrip('"\'fF \n\t)')
        if before.endswith("ELSE") and after.startswith("END"):
            continue
        return m.start(), end, operand
    return None


def guard(text: str) -> tuple[str, int]:
    n = 0
    pos = 0
    while True:
        site = find_site(text, pos)
        if site is None:
            return text, n
        start, end, operand = site
        hop = text[start:end]
        wrapped = (
            f"CASE WHEN ABS{operand} >= 1e16 THEN CAST({operand} AS DOUBLE) "
            f"ELSE {hop} END"
        )
        text = text[:start] + wrapped + text[end:]
        n += 1
        # rescan from the wrapper start: the duplicated operand may itself
        # contain an unguarded inner hop (fixpoint, innermost resolved on
        # later iterations)
        pos = start


def main() -> None:
    args = sys.argv[1:]
    dry = "--dry" in args
    files = [a for a in args if a != "--dry"]
    total = 0
    for f in files:
        p = pathlib.Path(f)
        src = p.read_text()
        out, n = guard(src)
        total += n
        print(f"{f}: {n} hop(s) guarded")
        if n and not dry:
            p.write_text(out)
    print(f"total: {total}")


if __name__ == "__main__":
    main()
