"""Clip — the result envelope.

Mirrors bullet-core's ``Clip`` {records: [...], meta: {...}} JSON shape
(/root/reference src/main/java/com/yahoo/bullet/storm/JoinBolt.java:270-273;
Clip.RECORDS_KEY / Clip.META_KEY usage in JoinBoltTest.java:345,599-600) and
the result-metadata concepts of SURVEY.md §2.7 (query id / receive time /
finish time, JoinBoltTest.java:569-616).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any

RECORDS_KEY = "records"
META_KEY = "meta"

# metadata concept keys (bullet-core Meta.Concept analogues)
QUERY_ID_KEY = "query_id"
QUERY_RECEIVE_TIME_KEY = "query_receive_time"
QUERY_FINISH_TIME_KEY = "query_finish_time"
WINDOW_NUMBER_KEY = "window_number"
WINDOW_EMIT_TIME_KEY = "window_emit_time"
SIGNAL_KEY = "signal"
ERRORS_KEY = "errors"


@dataclass
class Clip:
    records: list[dict[str, Any]] = field(default_factory=list)
    meta: dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def of(records: list[dict[str, Any]], **meta: Any) -> "Clip":
        return Clip(records=records, meta=meta)

    def add_meta(self, **meta: Any) -> "Clip":
        self.meta.update(meta)
        return self

    def to_json(self) -> str:
        return json.dumps(
            {RECORDS_KEY: self.records, META_KEY: self.meta},
            default=str,
            sort_keys=False,
        )

    @staticmethod
    def from_json(s: str) -> "Clip":
        obj = json.loads(s)
        return Clip(records=obj.get(RECORDS_KEY, []), meta=obj.get(META_KEY, {}))

    @staticmethod
    def error(query_id: str, errors: list[str]) -> "Clip":
        """FAIL-signal result (JoinBolt.java:261-268,304-306)."""
        return Clip(
            records=[],
            meta={
                QUERY_ID_KEY: query_id,
                ERRORS_KEY: errors,
                SIGNAL_KEY: "FAIL",
                QUERY_FINISH_TIME_KEY: int(time.time() * 1000),
            },
        )
