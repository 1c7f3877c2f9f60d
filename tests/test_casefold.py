"""Engine-identical case fold (r10): Spark and DuckDB disagree on
lower() for exactly 72 code points (exhaustive BMP + cased-astral-block
sweep); fold_lower pre-translates them so every dual-compiled text
operator tokenizes/fingerprints identically on ANY input."""

import duckdb
import pytest

from bullet_storm_spark.functions import text as T


PROBES = [
    "İstanbul ISTANBUL ıssız",          # Turkish dotted I: Spark i+U+0307 vs duck i
    "ΣΙΣΥΦΟΣ σίσυφος τέλος",            # contextual final sigma
    "Crème brûlée TASTES great",        # general accents (never diverged)
    "\U00010570ithkuqi \U00010597 text",  # Vithkuqi (Unicode-version skew)
    "Ᲊ Ⱟ Ꟁ Ɤ Ꟁ",     # newer-Unicode Latin/Glagolitic
    "ß SHARP ẞ STRASSE",
    "中文 emoji 😀 mixed",
]


@pytest.fixture(scope="module")
def frames(spark):
    rows = list(enumerate(PROBES))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    return df, con


def test_fold_lower_engine_identity_on_probes(frames):
    df, con = frames
    for col, sql in [
        (T.fingerprint("text"), T.fingerprint_sql("text")),
        (T.token_count("text"), T.token_count_sql("text")),
        (T.quality_score("text"), T.quality_score_sql("text")),
    ]:
        sp = {r.doc_id: r.v for r in df.select("doc_id", col.alias("v")).collect()}
        du = dict(con.execute(f"SELECT doc_id, {sql} FROM docs").fetchall())
        assert sp == du


def test_fold_lower_identity_on_all_72_divergent_points(spark):
    # each divergent code point as a standalone token: the fingerprint
    # (md5 of the folded text) must agree byte-for-byte across engines
    rows = [(cp, chr(cp) + " tail") for cp in T._CASEFOLD_1TO1] + [
        (0x0130, "İ tail")
    ]
    assert len(rows) == 72
    df = spark.createDataFrame(rows, "cp long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE d (cp BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    sp = {r.cp: r.v for r in df.select("cp", T.fingerprint("text").alias("v")).collect()}
    du = dict(con.execute(f"SELECT cp, {T.fingerprint_sql('text')} FROM d").fetchall())
    assert sp == du


def test_fold_targets_are_lower_stable(spark):
    # the pre-translation targets must be fixed points of lower() in BOTH
    # engines, or the fold would re-diverge after translate
    rows = [(cp, chr(t)) for cp, t in T._CASEFOLD_1TO1.items()]
    df = spark.createDataFrame(rows, "cp long, t string")
    from pyspark.sql import functions as F

    assert all(
        r.t == r.lt for r in df.select("t", F.lower("t").alias("lt")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (cp BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    assert all(a == b for a, b in con.execute("SELECT t, lower(t) FROM d").fetchall())


def test_whitespace_class_engine_identity(spark):
    # RE2 (DuckDB) excludes \x0B from \s while Java (Spark) includes it;
    # the explicit _WS class must tokenize identically — including the
    # vertical tab — and the unicode spaces (NBSP, thin, zero-width,
    # ideographic, NEL) must stay NON-separators in both engines
    rows = [
        (0, "vertical\x0bfeed"),
        (1, "a\u00a0b"),
        (2, "a\u2009b\u2003c"),
        (3, "a\u200bb"),
        (4, "a\u3000b"),
        (5, "ab"),
        (6, "a\r\nb\tc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    for col, sql in [
        (T.token_count("text"), T.token_count_sql("text")),
        (T.fingerprint("text"), T.fingerprint_sql("text")),
        (T.quality_score("text"), T.quality_score_sql("text")),
    ]:
        sp = {r.doc_id: r.v for r in df.select("doc_id", col.alias("v")).collect()}
        du = dict(con.execute(f"SELECT doc_id, {sql} FROM d").fetchall())
        assert sp == du
    counts = {
        r.doc_id: r.v
        for r in df.select("doc_id", T.token_count("text").alias("v")).collect()
    }
    assert counts[0] == 2  # \x0B separates
    assert counts[1] == 1  # NBSP does not


def test_ascii_fold_is_plain_lower(spark):
    # the fold must be a no-op versus plain lower() on ASCII — the
    # driver's corpus and every existing oracle are unaffected
    from pyspark.sql import functions as F

    rows = [(i, f"The Quick BROWN fox {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "i long, text string")
    out = df.select(
        T.fold_lower(F.col("text")).alias("a"), F.lower("text").alias("b")
    ).collect()
    assert all(r.a == r.b for r in out)
