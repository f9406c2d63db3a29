"""Pipeline observability counters (no-silent-caps rule).

Stages that bound their work — dropping a degenerate LSH bucket, falling
back to a quadratic scan on an unsplittable near-dup bucket — must SAY so:
a capped stage that reports nothing reads as "covered everything" when it
didn't. Counters live in one named, zero-CPU Ray actor so any worker task
can increment them (off the hot path — increments happen only on rare cap
events, never per row) and the driver can snapshot them
into stage manifests / test assertions.

The actor is session-scoped (dies with ray.shutdown()); ``get_if_exists``
makes concurrent creation from many workers race-free.
"""

from __future__ import annotations

import ray

__all__ = ["incr", "snapshot", "reset", "delta"]

_ACTOR_NAME = "graphforge_metrics"

_handle = None  # per-process cached handle (see _actor)


@ray.remote(num_cpus=0)
class _MetricsActor:
    def __init__(self) -> None:
        self._counts: dict[str, int] = {}

    def incr(self, key: str, n: int = 1) -> None:
        self._counts[key] = self._counts.get(key, 0) + int(n)

    def snapshot(self) -> dict[str, int]:
        return dict(self._counts)

    def reset(self) -> None:
        self._counts = {}


def _actor():
    # lifetime="detached" is REQUIRED, not a nicety: a named non-detached
    # actor dies the moment its last handle is dropped, so a transient
    # `_actor().incr.remote(...)` pattern would silently create-increment-
    # kill a fresh actor per call and every snapshot would read {}.
    # Detached ties the actor's life to the Ray session (gone at
    # ray.shutdown()), independent of which process created it. The
    # per-process handle cache avoids a GCS name lookup per increment.
    global _handle
    sess = ray.get_runtime_context().get_job_id()
    if _handle is None or _handle[0] != sess:
        _handle = (
            sess,
            _MetricsActor.options(
                name=_ACTOR_NAME, get_if_exists=True, lifetime="detached"
            ).remote(),
        )
    return _handle[1]


def incr(key: str, n: int = 1) -> None:
    """Counter increment (safe from worker tasks). BLOCKING on the actor
    ack: increments happen only on rare cap events, and the ack
    guarantees a driver snapshot taken after the execution finishes sees
    every increment (fire-and-forget would race the snapshot)."""
    if n:
        ray.get(_actor().incr.remote(key, int(n)))


def snapshot() -> dict[str, int]:
    """Current counter values (driver-side, blocking)."""
    return ray.get(_actor().snapshot.remote())


def reset() -> None:
    ray.get(_actor().reset.remote())


def delta(before: dict[str, int], after: dict[str, int]) -> dict[str, int]:
    """Counter deltas between two snapshots (for per-stage manifests)."""
    keys = set(before) | set(after)
    out = {k: after.get(k, 0) - before.get(k, 0) for k in keys}
    return {k: v for k, v in out.items() if v}
