"""Chat-transcript normalization: turn parsing, structural QA, DuckDB
parity, and the zero-shuffle report plan."""

import duckdb
import pytest

from bullet_storm_spark.operators import chat as C

ROWS = [
    (0, "<|system|>sys<|user|>hi<|assistant|>hello"),        # well-formed
    (1, "<|user|>q1<|assistant|>a1<|user|>q2<|assistant|>a2"),  # no system, ok
    (2, "<|user|>q<|assistant|>a<|assistant|>again"),        # repeated run
    (3, "<|assistant|>orphan"),                              # opens wrong
    (4, "<|system|>s<|user|>unanswered"),                    # no assistant
    (5, "no markers at all"),                                # 0 turns
    (6, "<|user|>q<|assistant|>a<|user|>more"),              # unanswered tail
    (7, "<|user|>q<|assistant|>a<|system|>late<|user|>q2<|assistant|>a2"),
    (8, "<|system|>a<|system|>b<|user|>q<|assistant|>r"),    # double system
]


@pytest.fixture(scope="module")
def chats(spark):
    return spark.createDataFrame(ROWS, "id long, chat string")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE chats (id BIGINT, chat VARCHAR)")
    con.executemany("INSERT INTO chats VALUES (?,?)", ROWS)
    return con


def test_parse_turns(chats, duck):
    s = [tuple(r) for r in C.parse_turns(chats, "id", "chat").collect()]
    d = duck.execute(C.parse_turns_sql("chats", "id", "chat")).fetchall()
    assert s == [tuple(r) for r in d]
    t0 = [r for r in s if r[0] == 0]
    assert t0 == [
        (0, 1, "system", "sys", 3),
        (0, 2, "user", "hi", 2),
        (0, 3, "assistant", "hello", 5),
    ]
    assert not [r for r in s if r[0] == 5]  # markerless doc has no turns


def test_conversation_report(chats, duck):
    s = [tuple(r) for r in C.conversation_report(chats, "id", "chat").collect()]
    d = duck.execute(C.conversation_report_sql("chats", "id", "chat")).fetchall()
    assert s == [tuple(r) for r in d]
    by = {r[0]: r for r in s}
    # (n_turns, n_system, n_user, n_assistant, user_chars, assistant_chars,
    #  repeated_role_runs, well_formed)
    assert by[0][1:] == (3, 1, 1, 1, 2, 5, 0, True)
    assert by[1][1:] == (4, 0, 2, 2, 4, 4, 0, True)
    assert by[2][7] == 1 and by[2][8] is False     # repeated assistant
    assert by[3][8] is False                       # opens with assistant
    assert by[4][8] is False                       # no assistant turn
    assert by[5][1] == 0 and by[5][8] is False     # empty transcript
    assert by[6][8] is False                       # trailing unanswered user
    assert by[7][8] is False                       # mid-conversation system
    assert by[8][8] is False                       # two system prompts


def test_report_is_scan_level(chats):
    """No hash shuffle and no join — the report is pure scan expressions
    (the final orderBy's rangepartitioning exchange is the only allowed
    one)."""
    plan = (
        C.conversation_report(chats, "id", "chat")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan
