"""Partitioned, compressed snapshot store — the BatchManager analogue.

The reference batches stored queries for replay: keys hash onto
partitions, each partition holds batches of ~batch_size entries, batches
are GZIP-compressed, and only CHANGED batches are re-compressed when the
store mutates (/root/reference src/main/java/com/yahoo/bullet/storm/
batching/BatchManager.java:28-46,56-71 and batching/Partition.java:28-221).
That protocol exists so replaying ~100k standing queries to a restarted
worker neither serializes one giant blob nor recompresses the world on
every update.

Spark translation (driver-side registry snapshot, no Storm acking):

* queries hash (md5 of id — stable across processes, unlike Python's
  seeded ``hash``) onto ``partition_count`` partition files;
* each partition file holds its entries chunked into batches of
  ``batch_size`` (the replay emit unit — a reader streams batch by batch
  and never materializes the whole store);
* partition files are gzip-compressed JSON; a manifest records each
  partition's content fingerprint, and ``write()`` rewrites ONLY the
  partitions whose fingerprint changed — the dirty-batch-only
  recompression of the reference at partition granularity.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
from typing import Any, Iterator


class BatchedSnapshotStore:
    def __init__(
        self,
        directory: str,
        partition_count: int = 16,
        batch_size: int = 512,
        compress: bool = True,
    ) -> None:
        if partition_count < 1:
            raise ValueError("partition_count must be > 0")
        self.directory = directory
        self.partition_count = partition_count
        self.batch_size = batch_size
        self.compress = compress
        os.makedirs(directory, exist_ok=True)

    # -- layout ---------------------------------------------------------
    def _part_path(self, k: int) -> str:
        ext = "json.gz" if self.compress else "json"
        return os.path.join(self.directory, f"p{k:04d}.{ext}")

    def _manifest_path(self) -> str:
        return os.path.join(self.directory, "manifest.json")

    @staticmethod
    def partition_of(query_id: str, partition_count: int) -> int:
        digest = hashlib.md5(query_id.encode("utf-8")).digest()
        return int.from_bytes(digest[:4], "big") % partition_count

    # -- write ----------------------------------------------------------
    def write(self, items: list[dict], removed: set[str] | list[str]) -> int:
        """Persist the full logical snapshot; physically rewrite only the
        partitions whose content changed since the manifest was written.
        ``items`` are dicts with at least an ``"id"`` key. Returns the
        number of partition files rewritten."""
        parts: dict[int, dict[str, list]] = {
            k: {"queries": [], "removed": []} for k in range(self.partition_count)
        }
        for item in items:
            parts[self.partition_of(item["id"], self.partition_count)][
                "queries"
            ].append(item)
        for rid in sorted(removed):
            parts[self.partition_of(rid, self.partition_count)]["removed"].append(rid)

        manifest = self._read_manifest()
        new_manifest: dict[str, str] = {}
        rewritten = 0
        for k, content in parts.items():
            # canonical bytes: entries sorted by id so fingerprints are
            # insertion-order-independent
            content["queries"].sort(key=lambda q: q["id"])
            batches = [
                content["queries"][i : i + self.batch_size]
                for i in range(0, len(content["queries"]), self.batch_size)
            ]
            payload = json.dumps(
                {"batches": batches, "removed": content["removed"]},
                sort_keys=True,
            ).encode("utf-8")
            fp = hashlib.md5(payload).hexdigest()
            new_manifest[str(k)] = fp
            path = self._part_path(k)
            if manifest.get(str(k)) == fp and os.path.exists(path):
                continue  # clean partition: skip the rewrite/recompress
            tmp = path + ".tmp"
            if self.compress:
                # fixed mtime=0 keeps gzip output deterministic for a
                # given payload (the fingerprint covers the payload only)
                with open(tmp, "wb") as raw:
                    with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
                        f.write(payload)
            else:
                with open(tmp, "wb") as f:
                    f.write(payload)
            os.replace(tmp, path)
            rewritten += 1
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_manifest, f)
        os.replace(tmp, self._manifest_path())
        return rewritten

    def _read_manifest(self) -> dict[str, str]:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    # -- read -----------------------------------------------------------
    def _read_partition(self, k: int) -> dict[str, Any]:
        path = self._part_path(k)
        try:
            if self.compress:
                with gzip.open(path, "rb") as f:
                    return json.loads(f.read())
            with open(path, "rb") as f:
                return json.loads(f.read())
        except FileNotFoundError:
            return {"batches": [], "removed": []}

    def iter_batches(self) -> Iterator[list[dict]]:
        """Stream query batches partition by partition — the replay path
        holds at most one batch (~batch_size entries) plus one partition
        in memory, never the whole store."""
        for k in range(self.partition_count):
            yield from self._read_partition(k)["batches"]

    def removed_ids(self) -> set[str]:
        out: set[str] = set()
        for k in range(self.partition_count):
            out.update(self._read_partition(k)["removed"])
        return out

    def exists(self) -> bool:
        return os.path.exists(self._manifest_path())
