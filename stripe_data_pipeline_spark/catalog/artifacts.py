"""Session-scoped per-sf_dir artifact caches for roundtrip checks.

Several catalog queries build a one-off on-disk artifact (format
shards, a dedup index + decisions mart) once per sf_dir and then only
read it — the bench's ARTIFACT_WARM contract. Before r14 every such
query carried its own ~15-line copy of the cache-dict + atexit-rmtree
+ build-once boilerplate (and each copy had to re-implement the
register-once guard correctly); this is the one shared
implementation.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOTS: list[str] = []


def _cleanup() -> None:
    for r in _ROOTS:
        shutil.rmtree(r, ignore_errors=True)


def cached_artifact(cache: dict, key: str, prefix: str, build) -> str:
    """Return ``cache[key]``, building it on first use: ``build`` gets
    a fresh temp work dir (removed at interpreter exit, whatever path
    inside it the builder returns) and must return the artifact path
    to cache. Raising inside ``build`` caches nothing, so a failed
    build retries on the next call."""
    path = cache.get(key)
    if path is None:
        if not _ROOTS:
            atexit.register(_cleanup)
        work = tempfile.mkdtemp(prefix=prefix)
        _ROOTS.append(work)
        path = build(work)
        cache[key] = path
    return path
