#!/usr/bin/env python
"""Generate LARGER documents/embeddings tables for the weak-scaling curve
(VERDICT r9 item 2: empirical sec-vs-sf evidence past sf0.1).

The driver's testdata is read-only and stops at sf0.1, so the curve's
sf0.3/sf1/sf3 points extend the SAME generative process measured from
/root/testdata/sf0.1 (uniform 31-word salad, 10..100 words/doc, 5 langs
at the observed mix, 20 sources, ~0.2% exact-dup rate; embeddings: 10
spherical clusters in 64-d at the observed per-label spread). Row counts
scale linearly from sf0.1's 5,000 docs / 2,000 vectors. Deterministic
(seed 9042); output under .scaledata/ (gitignored, regenerable).

This data backs PERFORMANCE curves only — correctness stays pinned to
the driver's own tables.

Usage: python scripts/gen_scaledata.py [sf ...]   (default: 0.3 1 3)
"""
from __future__ import annotations

import pathlib
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = pathlib.Path("/root/repo/.scaledata")
VOCAB = [
    "spark", "window", "merge", "table", "column", "order", "small", "sort",
    "fast", "value", "scan", "batch", "part", "line", "query", "agg", "hash",
    "key", "group", "filter", "customer", "stream", "slow", "vector", "join",
    "shuffle", "cache", "index", "plan", "codegen", "row",
]
LANGS = ["en", "en", "en", "en", "zh", "es", "fr", "de"]  # ~observed mix


def gen_documents(sf: float, rng: random.Random) -> pa.Table:
    n = int(50_000 * sf)
    texts, langs, sources, ids, n_chars = [], [], [], [], []
    for i in range(n):
        if texts and rng.random() < 0.002:  # the observed exact-dup rate
            t = texts[rng.randrange(len(texts))]
        else:
            t = " ".join(
                rng.choice(VOCAB) for _ in range(rng.randint(10, 100))
            )
        texts.append(t)
        ids.append(i)
        langs.append(rng.choice(LANGS))
        sources.append(f"src{rng.randrange(20)}")
        n_chars.append(len(t))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def gen_embeddings(sf: float, seed: int) -> pa.Table:
    # measured from /root/testdata/sf0.1: UNIT-NORM isotropic 64-d
    # vectors (within-label mean cosine == between-label == 0, norm std
    # 3e-8) with uniform random labels — i.e. the labels are decorative
    # and near-dup pairs come from random geometry (cos ~ N(0, 1/64))
    n = int(20_000 * sf)
    rs = np.random.RandomState(seed)
    labels = rs.randint(0, 10, size=n)
    vecs = rs.normal(0.0, 1.0, size=(n, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                vecs.astype(np.float32).tolist(), pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype("int32"), pa.int32()),
        }
    )


def gen_events(sf: float, seed: int) -> pa.Table:
    # calibrated to /root/testdata/sf0.1 events: value ~ Exp(mean 50)
    # (measured mean 49.9 == stddev 49.6, median 34.8 == 50 ln 2), 5
    # uniform event types, users linear in sf (sf0.1 -> 1500), ts
    # uniform over Jan 2024 as TIMESTAMP_NTZ micros, props a tiny JSON
    n = int(1_000_000 * sf)
    users = max(int(15_000 * sf), 1)
    rs = np.random.RandomState(seed)
    types = np.array(["click", "view", "purchase", "signup", "error"])
    epoch_us = 1_704_067_200_000_000  # 2024-01-01 00:00:00
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = epoch_us + rs.randint(0, span_us, size=n, dtype=np.int64)
    ks = rs.randint(0, 100, size=n)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rs.randint(0, users, size=n).astype("int64"), pa.int64()
            ),
            "event_type": pa.array(types[rs.randint(0, 5, size=n)]),
            "value": pa.array(
                np.round(rs.exponential(50.0, size=n), 2), pa.float64()
            ),
            "props": pa.array([f'{{"k": {k}}}' for k in ks]),
        }
    )


def main() -> None:
    sfs = [float(a) for a in sys.argv[1:]] or [0.3, 1.0, 3.0]
    for sf in sfs:
        tag = f"{sf:g}"
        out = BASE / f"sf{tag}"
        out.mkdir(parents=True, exist_ok=True)
        rng = random.Random(9042 + int(sf * 100))
        pq.write_table(gen_documents(sf, rng), out / "documents.parquet")
        pq.write_table(
            gen_embeddings(sf, 9042 + int(sf * 100)), out / "embeddings.parquet"
        )
        pq.write_table(gen_events(sf, 9042 + int(sf * 100)), out / "events.parquet")
        print(
            f"sf{tag}: {int(50_000 * sf)} docs, {int(20_000 * sf)} vectors, "
            f"{int(1_000_000 * sf)} events -> {out}"
        )


if __name__ == "__main__":
    main()
