"""Per-partition lineage manifests → checkpoint-resumable builds.

Spark's lineage recovers *tasks*, not *jobs* (SURVEY.md §4): if the driver
dies mid-build, a bare rerun starts from zero. The contract (BASELINE.json
north_rule) requires job-level resume with per-partition lineage + metrics,
so every shard partition writes a manifest JSON *after* its data is fully
written (write-temp → atomic rename), and a rerun skips partitions whose
manifest is `done` with a matching input fingerprint.

Analog: Lucene's commit points / segments_N file — a segment exists only
once the commit metadata names it.
"""

from __future__ import annotations

import json
import os
import time


def manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, "manifests", f"part-{part:05d}.json")


def write_manifest(out_dir: str, part: int, payload: dict) -> None:
    path = manifest_path(out_dir, part)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    payload = {"partition_id": part, "written_at": time.time(), **payload}
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)  # atomic on POSIX


def read_manifest(out_dir: str, part: int) -> dict | None:
    path = manifest_path(out_dir, part)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def partition_done(out_dir: str, part: int, fingerprint: str) -> bool:
    m = read_manifest(out_dir, part)
    return (
        m is not None
        and m.get("status") == "done"
        and m.get("input_fingerprint") == fingerprint
    )


def all_manifests(out_dir: str) -> list[dict]:
    d = os.path.join(out_dir, "manifests")
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out
