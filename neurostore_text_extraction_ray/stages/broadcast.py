"""Per-worker broadcast cache: ``ray.get`` + deserialize a broadcast
object once per worker process, not once per batch task. Measured: a
150k-entry python dict costs ~1 s to deserialize; paying that per batch
dominated a whole pipeline stage. Prefer broadcasting numpy arrays
(near-zero deserialize) and use this cache for whatever remains.

Small keyed LRU (not a single slot): one worker routinely interleaves
batches from two broadcast-using stages of the same pipeline under Ray
Data's streaming executor, and a clear-on-miss cache would thrash —
every batch re-paying the deserialize the cache exists to avoid."""

from __future__ import annotations

from collections import OrderedDict

_CACHE: OrderedDict = OrderedDict()
_MAX_ENTRIES = 4


def get_broadcast(ref):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    value = ray.get(ref)
    _CACHE[key] = value
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return value
