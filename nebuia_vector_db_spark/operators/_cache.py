"""Shared releasable-cache registry (round 11, review finding).

Several operators persist relations that feed multiple consumers
(posting lists, banded hashes, per-domain counts) and hand them out
inside returned DataFrames — the caller can't unpersist what it
can't see, so each module keeps a session registry and exposes a
``release_cached_relations()`` (the r9 ADVICE pattern). The
registry/release pair was copy-pasted per module; this factory is
the single implementation. Each module still owns its OWN list (so
releasing image-hash caches doesn't drop dedup posting lists
mid-bench) and its public names are unchanged:

    _CACHED_RELATIONS, release_cached_relations = cached_relation_registry()
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cached_relation_registry() -> tuple[list[DataFrame], "callable"]:
    """A fresh (registry_list, release_fn) pair. ``release_fn``
    unpersists every registered relation, tolerating an
    already-stopped session, clears the list, and returns the count
    released."""
    relations: list[DataFrame] = []

    def release_cached_relations() -> int:
        n = 0
        for df in relations:
            try:
                df.unpersist()
                n += 1
            except Exception:
                pass  # session already stopped — nothing to release
        relations.clear()
        return n

    return relations, release_cached_relations
