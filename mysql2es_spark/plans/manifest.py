"""Index manifest: segment inventory + global stats + atomic publish.

The reference swaps an ES alias atomically so readers never see a
half-built index (README-EN.org:252-258).  Our equivalent: manifests are
immutable numbered JSON files; ``CURRENT`` is a one-line pointer file
replaced with ``os.replace`` (atomic on POSIX).  Readers resolve CURRENT
once and read only the segment dirs it names.

The manifest also carries the sync checkpoint (``last_snapshot_id``) —
the reference keeps its last increment value in a temp file or a MySQL
table (README-EN.org:48-49, 65-66); ours lives with the index it
describes so index state and checkpoint can never diverge.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class SegmentMeta:
    name: str
    n_docs: int
    sum_dl: int
    min_doc_id: int
    max_doc_id: int
    n_tombstones: int = 0
    snapshot_id: int | None = None


@dataclass
class Manifest:
    version: int
    n_buckets: int
    block_size: int
    chunk_span: int
    analyzer: str = "code"
    segments: list[SegmentMeta] = field(default_factory=list)
    next_doc_id_base: int = 0
    last_snapshot_id: int | None = None
    last_handle_ts: int | None = None  # wall time of last successful build
                                       # (compensation guard, README-EN.org:74-75)
    tombstones: str | None = None      # root-relative dir of the current
                                       # (segment, doc_id) tombstone set,
                                       # partitioned by segment

    @property
    def n_docs_total(self) -> int:
        return sum(s.n_docs for s in self.segments)

    @property
    def avgdl(self) -> float:
        n = self.n_docs_total
        return (sum(s.sum_dl for s in self.segments) / n) if n else 0.0

    def segment_dir(self, root: str, name: str) -> str:
        return os.path.join(root, "segments", name)


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, f"manifest-{version:06d}.json")


def publish(root: str, m: Manifest) -> None:
    """Write manifest-<v>.json, then atomically swing CURRENT to it."""
    os.makedirs(root, exist_ok=True)
    with open(_manifest_path(root, m.version), "w") as f:
        json.dump(asdict(m), f, indent=1)
    tmp = os.path.join(root, "CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(f"manifest-{m.version:06d}.json")
    os.replace(tmp, os.path.join(root, "CURRENT"))


def load_current(root: str) -> Manifest | None:
    cur = os.path.join(root, "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        name = f.read().strip()
    with open(os.path.join(root, name)) as f:
        d = json.load(f)
    d["segments"] = [SegmentMeta(**s) for s in d["segments"]]
    return Manifest(**d)
