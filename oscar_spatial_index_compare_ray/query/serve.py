"""Query-serving actor: a persisted index opened ONCE per actor, served
across many queries with warm row-group caches.

The reference's interactive query app holds the mmap'd index open for
the whole REPL/benchmark session (apps/mainq.cpp:601-670, --preload
:784-802); the engine analogue is a Ray actor holding a
ParquetBackend-served QueryEngine, so repeated queries reuse loaded
row groups and the per-query LRU result cache
(HCQRIndexWithCache analogue, apps/mainq.cpp:495-497).

Scale shape: N such actors behind round-robin dispatch serve a query
stream; each holds only vocab + populated-pixel list + LRU'd row
groups, never a full table.
"""

from __future__ import annotations

import ray


@ray.remote
class QueryServer:
    def __init__(self, index_dir: str):
        from ..pipelines.persist import load_engine

        self.eng = load_engine(index_dir)

    def query(self, q: str) -> list[int]:
        """Flattened sorted doc ids (complete + flaten, cached)."""
        return list(self.eng.flatten_query(q))

    def cell_count(self, q: str) -> int:
        return self.eng.complete(q).cell_count()

    def vocab_size(self) -> int:
        return len(self.eng.backend.vocab())


def start_server(index_dir: str, **actor_opts) -> "ray.actor.ActorHandle":
    return QueryServer.options(**actor_opts).remote(index_dir)


class QueryServerPool:
    """N QueryServer actors behind deterministic query-hash dispatch —
    the scale form of interactive serving (each actor holds its own
    warm row-group LRU; identical queries always hit the same actor's
    result cache)."""

    def __init__(self, index_dir: str, n: int = 2, **actor_opts):
        self._servers = [start_server(index_dir, **actor_opts) for _ in range(n)]

    def _pick(self, q: str):
        import zlib

        return self._servers[zlib.crc32(q.encode()) % len(self._servers)]

    def query(self, q: str) -> list[int]:
        return ray.get(self._pick(q).query.remote(q))

    def query_many(self, qs: list[str]) -> list[list[int]]:
        """Dispatch a batch across the pool, gather in order."""
        refs = [self._pick(q).query.remote(q) for q in qs]
        return ray.get(refs)

    def shutdown(self) -> None:
        for s in self._servers:
            ray.kill(s)
