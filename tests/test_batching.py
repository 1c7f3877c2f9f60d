"""Partitioned/compressed snapshot store (streaming/batching.py) — the
BatchManager replay-batching analogue: stable key->partition routing,
batch-chunked streaming reads, gzip compression, and dirty-partition-only
rewrites."""

import gzip
import json
import os

from bullet_storm_spark.plans.query import Query, Raw
from bullet_storm_spark.streaming.batching import BatchedSnapshotStore
from bullet_storm_spark.streaming.registry import QueryRegistry, QueryStatus


def _items(n, prefix="q"):
    return [
        {"id": f"{prefix}{i}", "query": {"agg": "raw"}, "receive_time_ms": i}
        for i in range(n)
    ]


def test_roundtrip_and_batch_chunking(tmp_path):
    store = BatchedSnapshotStore(str(tmp_path / "b"), partition_count=4, batch_size=10)
    items = _items(95)
    store.write(items, {"qdead1", "qdead2"})
    read = [item for batch in store.iter_batches() for item in batch]
    assert sorted(i["id"] for i in read) == sorted(i["id"] for i in items)
    assert store.removed_ids() == {"qdead1", "qdead2"}
    # the replay emit unit is bounded by batch_size
    assert all(len(b) <= 10 for b in store.iter_batches())


def test_partition_routing_is_stable_and_total(tmp_path):
    k1 = BatchedSnapshotStore.partition_of("some-query", 16)
    assert k1 == BatchedSnapshotStore.partition_of("some-query", 16)
    assert 0 <= k1 < 16
    # ids spread over partitions (not all in one)
    parts = {BatchedSnapshotStore.partition_of(f"q{i}", 16) for i in range(200)}
    assert len(parts) > 8


def test_only_dirty_partitions_rewritten(tmp_path):
    store = BatchedSnapshotStore(str(tmp_path / "b"), partition_count=8, batch_size=50)
    items = _items(100)
    first = store.write(items, set())
    assert first == 8  # everything dirty on the first write
    # unchanged logical state: zero physical rewrites
    assert store.write(list(reversed(items)), set()) == 0
    # touch ONE id: only that id's partition recompresses
    items[0] = dict(items[0], receive_time_ms=999)
    assert store.write(items, set()) == 1


def test_files_are_gzip_and_smaller(tmp_path):
    plain = BatchedSnapshotStore(
        str(tmp_path / "p"), partition_count=1, compress=False
    )
    gz = BatchedSnapshotStore(str(tmp_path / "g"), partition_count=1, compress=True)
    items = _items(500)
    plain.write(items, set())
    gz.write(items, set())
    gz_path = str(tmp_path / "g" / "p0000.json.gz")
    with open(gz_path, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"  # gzip magic
    assert os.path.getsize(gz_path) < os.path.getsize(
        str(tmp_path / "p" / "p0000.json")
    )
    assert [i["id"] for b in gz.iter_batches() for i in b] == [
        i["id"] for b in plain.iter_batches() for i in b
    ]


def test_registry_compact_replay_through_batched_store(tmp_path):
    storage = str(tmp_path / "reg")
    reg = QueryRegistry(storage_dir=storage, snapshot_partitions=4)
    for i in range(30):
        reg.submit(f"r{i}", Query(aggregation=Raw(size=1)))
    reg.remove("r7", QueryStatus.KILLED)
    reg._compact()
    assert os.path.isdir(os.path.join(storage, "batches"))
    assert not os.path.exists(os.path.join(storage, "queries.json"))

    fresh = QueryRegistry(storage_dir=storage, snapshot_partitions=4)
    assert fresh.replay() == 29
    assert "r7" in fresh.removed_ids
    assert sorted(fresh.queries) == sorted(f"r{i}" for i in range(30) if i != 7)


def test_registry_migrates_legacy_single_blob_snapshot(tmp_path):
    """An older store's queries.json loads once and is rewritten into the
    batched layout by replay()'s compaction."""
    storage = str(tmp_path / "reg")
    legacy = QueryRegistry.__new__(QueryRegistry)  # build the blob by hand
    os.makedirs(storage)
    from bullet_storm_spark.plans.serde import query_to_dict

    blob = {
        "queries": [
            {
                "id": "old1",
                "query": query_to_dict(Query(aggregation=Raw(size=2))),
                "receive_time_ms": 1,
                "deadline_ms": 1 << 60,
            }
        ],
        "removed": ["gone"],
    }
    with open(os.path.join(storage, "queries.json"), "w") as f:
        json.dump(blob, f)
    reg = QueryRegistry(storage_dir=storage)
    assert reg.replay() == 1
    assert "old1" in reg.queries and "gone" in reg.removed_ids
    assert not os.path.exists(os.path.join(storage, "queries.json"))
    # and the batched layout now carries the state for the NEXT restart
    again = QueryRegistry(storage_dir=storage)
    assert again.replay() == 1 and "old1" in again.queries
