"""Readability / RAKE keywords / concentration / seasonality: pure-Python
oracles + DuckDB twins + guards."""

import math
import random
import re
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.concentration import (
    token_concentration,
    token_concentration_sql,
)
from bullet_storm_spark.operators.keywords import (
    rake_keywords,
    rake_keywords_sql,
)
from bullet_storm_spark.operators.readability import (
    readability,
    readability_by_source,
    readability_by_source_sql,
    readability_sql,
)
from bullet_storm_spark.operators.seasonal import (
    seasonal_outliers,
    seasonal_outliers_sql,
    seasonality_profile,
    seasonality_profile_sql,
)

STOP10 = ["the", "and", "of", "to", "a", "in", "is", "that", "for", "with"]


def _duck(setup_sql, query):
    con = duckdb.connect()
    con.execute(setup_sql)
    return con.execute(query).fetchall()


def _docs_sql(rows, cols="doc_id, source, text"):
    vals = ", ".join(
        "(" + ", ".join(repr(v) for v in r) + ")" for r in rows
    )
    return f"CREATE TABLE documents AS SELECT * FROM (VALUES {vals}) v({cols})"


# --- readability ------------------------------------------------------------


def _py_readability(text):
    t = text.strip().lower()
    words = len(re.split(r"\s+", t))
    sents = max(1, len(re.findall(r"[.!?]+", t)))
    vg = len(re.findall(r"[aeiouy]+", t))
    se = len(re.findall(r"[aeiouy][b-df-hj-np-tv-z]*e\b", t))
    syl = max(words, vg - se)
    flesch = 206.835 - 1.015 * (words / sents) - 84.6 * (syl / words)
    fk = 0.39 * (words / sents) + 11.8 * (syl / words) - 15.59
    return words, sents, syl, flesch, fk


READ_DOCS = [
    (0, "srcA", "The cat sat on the mat. It was flat!"),
    (1, "srcA", "Incomprehensibilities notwithstanding, the multitudinous "
        "considerations necessitate extraordinarily elaborate deliberation."),
    (2, "srcB", "Go. Run! Stop? Yes."),
    (3, "srcB", "here come more quiet machines"),
]


def test_readability_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(READ_DOCS, "doc_id long, source string, text string")
    got = [tuple(r) for r in readability(df, "doc_id", "text").collect()]
    for (doc_id, w, s, syl, flesch, fk), (i, _, text) in zip(got, READ_DOCS):
        pw, ps, psyl, pf, pk = _py_readability(text)
        assert (doc_id, w, s, syl) == (i, pw, ps, psyl)
        assert flesch == pytest.approx(pf, abs=1e-12)
        assert fk == pytest.approx(pk, abs=1e-12)
    oracle = _duck(_docs_sql(READ_DOCS), readability_sql("documents", "doc_id", "text"))
    assert got == oracle
    # the hard doc reads harder than the easy doc on both scales
    by_id = {r[0]: r for r in got}
    assert by_id[1][4] < by_id[0][4] and by_id[1][5] > by_id[0][5]


def test_readability_by_source_matches_duckdb(spark):
    df = spark.createDataFrame(READ_DOCS, "doc_id long, source string, text string")
    got = [tuple(r) for r in readability_by_source(df, "source", "text").collect()]
    oracle = _duck(
        _docs_sql(READ_DOCS),
        readability_by_source_sql("documents", "source", "text"),
    )
    assert got == oracle
    assert [r[0] for r in got] == ["srcA", "srcB"] and got[0][1] == 2


@pytest.mark.parametrize("seed", range(4))
def test_readability_parity_fuzz(spark, seed):
    rng = random.Random(7100 + seed)
    vocab = ["the", "machine", "code", "a", "extraordinarily", "by", "sequence",
             "rode", "idea", "queue", "rhythm", "eye"]
    rows = []
    for i in range(rng.randint(3, 12)):
        n = rng.randint(1, 30)
        words = [rng.choice(vocab) for _ in range(n)]
        txt = ""
        for w in words:
            txt += w + rng.choice([" ", " ", " ", ". ", "! ", "? ", ", "])
        rows.append((i, "s%d" % (i % 3), txt.strip()))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = [tuple(r) for r in readability(df, "doc_id", "text").collect()]
    oracle = _duck(_docs_sql(rows), readability_sql("documents", "doc_id", "text"))
    assert got == oracle
    got2 = [tuple(r) for r in readability_by_source(df, "source", "text").collect()]
    oracle2 = _duck(
        _docs_sql(rows), readability_by_source_sql("documents", "source", "text")
    )
    assert got2 == oracle2


# --- RAKE -------------------------------------------------------------------


def _q6d(x):
    return Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


def _py_rake(texts, stop, k=25, min_occur=1, max_words=4):
    phrases = []
    pat_p = re.compile(r"[^a-z0-9\s]+")
    pat_s = re.compile(r"\b(" + "|".join(stop) + r")\b")
    for t in texts:
        seg = pat_s.sub("|", pat_p.sub("|", t.strip().lower()))
        for p in seg.split("|"):
            p = p.strip()
            if p and len(re.split(r"\s+", p)) <= max_words:
                phrases.append(p)
    freq, deg = {}, {}
    for p in phrases:
        ws = re.split(r"\s+", p)
        for w in ws:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ws)
    wscore = {w: _q6d(deg[w] / freq[w]) for w in freq}
    out = {}
    for p in set(phrases):
        ws = re.split(r"\s+", p)
        out[p] = (
            len(ws),
            phrases.count(p),
            float(sum(wscore[w] for w in ws)),
        )
    rows = [
        (p, nw, no, sc)
        for p, (nw, no, sc) in out.items()
        if no >= min_occur
    ]
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:k]


RAKE_DOCS = [
    (0, "s", "deep learning models need the large corpora, and clean data."),
    (1, "s", "clean data beats clever tricks; deep learning models scale."),
    (2, "s", "the corpora of clean data, for deep learning models."),
]


def test_rake_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(RAKE_DOCS, "doc_id long, source string, text string")
    got = [
        tuple(r)
        for r in rake_keywords(df, "text", stopwords=STOP10, min_occur=1).collect()
    ]
    expected = _py_rake([t for _, _, t in RAKE_DOCS], STOP10, min_occur=1)
    assert got == expected
    oracle = _duck(
        _docs_sql(RAKE_DOCS),
        rake_keywords_sql("documents", "text", stopwords=STOP10, min_occur=1),
    )
    assert got == oracle
    # the dominant phrase family wins (doc 0 extends it with "need"
    # before the stopword cut, so the 4-word run outscores the 2x core)
    assert got[0][0].startswith("deep learning models")


def test_rake_caps_and_validates(spark):
    df = spark.createDataFrame([(0, "s", "one two three four five six")],
                               "doc_id long, source string, text string")
    got = rake_keywords(df, "text", min_occur=1, max_words=4).collect()
    assert got == []  # 6-word run exceeds the candidate cap
    with pytest.raises(ValueError):
        rake_keywords(df, "text", k=0)
    with pytest.raises(ValueError):
        rake_keywords(df, "text", max_words=0)


@pytest.mark.parametrize("seed", range(4))
def test_rake_parity_fuzz(spark, seed):
    rng = random.Random(7200 + seed)
    vocab = ["data", "model", "scale", "the", "and", "fast", "query", "for",
             "plan", "join"]
    rows = []
    for i in range(rng.randint(3, 10)):
        n = rng.randint(3, 25)
        txt = ""
        for _ in range(n):
            txt += rng.choice(vocab) + rng.choice([" ", " ", ". ", ", ", "; "])
        rows.append((i, "s", txt.strip()))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = [
        tuple(r)
        for r in rake_keywords(df, "text", stopwords=STOP10, min_occur=1).collect()
    ]
    oracle = _duck(
        _docs_sql(rows),
        rake_keywords_sql("documents", "text", stopwords=STOP10, min_occur=1),
    )
    assert got == oracle
    assert got == _py_rake([t for _, _, t in rows], STOP10, min_occur=1)


# --- concentration ----------------------------------------------------------


def _py_gini(xs):
    xs = sorted(xs)
    n = len(xs)
    s0 = sum(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * s1 - (n + 1) * s0) / (n * s0)


def test_gini_matches_python_and_duckdb(spark):
    rows = [
        (i, "uni", "w " * 10) for i in range(5)
    ] + [
        (10, "skew", "w"), (11, "skew", "w"), (12, "skew", ("w " * 98)),
    ]
    rows = [(i, s, t.strip()) for i, s, t in rows]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = [
        tuple(r)
        for r in token_concentration(df, "source", "doc_id", "text").collect()
    ]
    oracle = _duck(
        _docs_sql(rows),
        token_concentration_sql("documents", "source", "doc_id", "text"),
    )
    assert got == oracle
    by = {r[0]: r for r in got}
    assert by["uni"][3] == pytest.approx(_py_gini([10] * 5)) == 0.0
    assert by["skew"][3] == pytest.approx(_py_gini([1, 1, 98]))
    # top decile of 3 docs = ceil(0.3) = 1 doc = the whale
    assert by["skew"][4] == pytest.approx(98 / 100)


# --- seasonality ------------------------------------------------------------

_US_H = 3_600_000_000


def _events(spark, cells):
    """cells: list of (type, epoch_hour) one event each."""
    rows = [(t, h * _US_H * 1000) for t, h in cells]
    return spark.createDataFrame(rows, "event_type string, ts_ns long")


def _events_sql(cells):
    vals = ", ".join(f"('{t}', make_timestamp({h * _US_H}))" for t, h in cells)
    return (
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals
        + ") v(event_type, ts)"
    )


def test_seasonality_profile_matches_duckdb(spark):
    # type "a": 3 events at epoch hour 0 (= Thursday 00:00 -> how 72),
    # 1 at hour 1; type "b": flat-ish
    cells = [("a", 0), ("a", 0), ("a", 0), ("a", 1), ("b", 5), ("b", 200)]
    got = [tuple(r) for r in seasonality_profile(_events(spark, cells)).collect()]
    oracle = _duck(_events_sql(cells), seasonality_profile_sql("events"))
    assert got == oracle
    a = got[0]
    assert a[0] == "a" and a[1] == 4 and a[2] == 2
    assert a[3] == 72  # epoch hour 0 is Thursday 00:00 UTC -> cell 72
    assert a[4] == pytest.approx(0.75)
    assert a[7] == pytest.approx(3 / (4 / 168))
    # trough is an unobserved cell (count 0, earliest such cell)
    assert a[6] == 0.0


def test_seasonal_outliers_matches_duckdb(spark):
    # hour-of-week 72 (epoch hour 0 + k*168): quiet baseline then a spike
    cells = []
    for week in range(6):
        cells.append(("a", week * 168))  # 1 event each week
    cells += [("a", 6 * 168)] * 9  # week 6: a 9-event spike
    got = [tuple(r) for r in seasonal_outliers(_events(spark, cells)).collect()]
    oracle = _duck(_events_sql(cells), seasonal_outliers_sql("events"))
    assert got == oracle
    spikes = [r for r in got if r[3] > 1]
    assert len(spikes) == 1 and spikes[0][3] == 9 and spikes[0][6] is True


@pytest.mark.parametrize("seed", range(3))
def test_seasonal_parity_fuzz(spark, seed):
    rng = random.Random(7300 + seed)
    cells = [
        (rng.choice(["a", "b", "c"]), rng.randint(0, 1000))
        for _ in range(rng.randint(10, 120))
    ]
    got = [tuple(r) for r in seasonality_profile(_events(spark, cells)).collect()]
    oracle = _duck(_events_sql(cells), seasonality_profile_sql("events"))
    assert got == oracle
    got2 = [tuple(r) for r in seasonal_outliers(_events(spark, cells)).collect()]
    oracle2 = _duck(_events_sql(cells), seasonal_outliers_sql("events"))
    assert got2 == oracle2
