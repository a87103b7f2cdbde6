"""Per-partition lineage manifests enabling checkpoint resume.

Output layout (SURVEY.md §4 checkpoint/resume design; the reference's
restartability is phase-granular only — tdbloader2 leaves sorted
intermediates on disk — so this is a deliberate improvement required by the
north rule):

    out/
      triples/part=<k>/*.parquet        one directory per input shard
      _manifest/part-<k>.json           written AFTER the partition's data

A partition is complete iff its manifest file exists (the manifest write is
the atomic commit point — data files without a manifest are ignored and
overwritten on resume). Resume = skip shards whose manifest exists.

Manifest fields (FIXTURES.md §5): part_id, input_fragments, rows_in,
triples_out, stage_latencies (seconds per stage).
"""

from __future__ import annotations

import json
import os
from typing import Any


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def manifest_path(out_dir: str, part_id: str) -> str:
    return os.path.join(manifest_dir(out_dir), f"part-{part_id}.json")


def is_complete(out_dir: str, part_id: str) -> bool:
    return os.path.exists(manifest_path(out_dir, part_id))


def completed_parts(out_dir: str) -> list[str]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        if f.startswith("part-") and f.endswith(".json"):
            out.append(f[len("part-") : -len(".json")])
    return out


def write_manifest(
    out_dir: str,
    part_id: str,
    *,
    input_fragments: list[str],
    rows_in: int,
    triples_out: int,
    stage_latencies: dict[str, float],
    extra: dict[str, Any] | None = None,
) -> str:
    """Atomic write (tmp + rename) — the partition's commit point."""
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = manifest_path(out_dir, part_id)
    doc = {
        "part_id": part_id,
        "input_fragments": input_fragments,
        "rows_in": rows_in,
        "triples_out": triples_out,
        "stage_latencies": stage_latencies,
    }
    if extra:
        doc.update(extra)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return path


def read_manifest(out_dir: str, part_id: str) -> dict[str, Any]:
    with open(manifest_path(out_dir, part_id)) as f:
        return json.load(f)
