"""Per-worker broadcast cache: ``ray.get`` + deserialize a broadcast
object once per worker process, not once per batch task. Measured: a
150k-entry python dict costs ~1 s to deserialize; paying that per batch
dominated a whole pipeline stage. Prefer broadcasting numpy arrays
(near-zero deserialize) and use this cache for whatever remains."""

from __future__ import annotations

_CACHE: dict = {}


def get_broadcast(ref):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _CACHE:
        _CACHE.clear()  # hold at most one broadcast per worker
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
