"""Per-worker-process stage cache — the task-based alternative to actor
pools.

An actor pool (``map_batches(Cls, concurrency=N)``) is the right shape when
per-actor setup is EXPENSIVE (model load) and the input is large enough to
feed N actors. For cheap-setup stages (compiled regexes, small tables) or
small inputs, a fixed pool is pure overhead: N actors spin up serially to
process a handful of blocks (measured: a 30-actor pool on a 2-block input
costs ~2 s of spin-up for <0.1 s of compute). The task path gives fluid CPU
sharing with parallelism = block count, and this module amortizes the setup
across all tasks that land on the same worker process via a module-global
cache (worker processes are reused across tasks; the same pattern as
``stages.linker.make_stateless_linker``).
"""

from __future__ import annotations

from typing import Any, Callable

__all__ = ["process_cached_stage"]

_CACHE: dict[str, Any] = {}


def process_cached_stage(
    cls: type, key: str | None = None, **ctor_kwargs
) -> Callable:
    """→ a plain function for ``map_batches`` that lazily constructs ONE
    ``cls(**ctor_kwargs)`` per worker process and calls it per batch.
    ``ctor_kwargs`` must be picklable (use ``ray.put`` refs for big
    state). The default cache key includes a repr-hash of the kwargs so
    the same class with different constructor arguments never shares a
    cached instance; pass ``key`` only to override that."""
    if key is None:
        import hashlib
        import pickle

        # pickle, not repr: numpy/pandas reprs ELIDE large values ('...'),
        # so different big-array kwargs would repr identically and share
        # a cached instance; pickle is content-based for array types
        kw = hashlib.blake2b(
            pickle.dumps(sorted(ctor_kwargs.items()), protocol=4),
            digest_size=8,
        ).hexdigest()
        key = f"{cls.__module__}.{cls.__qualname__}:{kw}"
    cache_key = key

    def stage(batch):
        inst = _CACHE.get(cache_key)
        if inst is None:
            inst = cls(**ctor_kwargs)
            _CACHE[cache_key] = inst
        return inst(batch)

    stage.__name__ = f"cached_{cls.__name__}"
    return stage
