"""Hashing kernels: content hashes (reference parity) and the sketch
primitives behind the dedup operators.

- ``md5_text``: MD5 of a file's text — reference
  ``ns_extract/pipelines/utils.py:40-54`` (change-detection hashes).
- ``config_hash``: 12-hex shake_256 of serialized kwargs — reference
  ``ns_extract/pipelines/base.py:266-268``.
- MinHash / SimHash: standard public constructions (Broder 1997;
  Charikar 2002) for the near-dup operators.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np

_MERSENNE = (1 << 61) - 1


def md5_text(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def config_hash(kwargs: dict) -> str:
    """shake_256(json(kwargs)).hexdigest(6) -> 12 hex chars
    (parity with base.py:266-268)."""
    blob = json.dumps(kwargs, sort_keys=True, default=str)
    return hashlib.shake_256(blob.encode("utf-8")).hexdigest(6)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of tokens (blake2b-based, deterministic
    across processes — never use Python's salted hash())."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = int.from_bytes(
            hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "little"
        )
    return out


def minhash_params(num_perm: int, seed: int = 42):
    """(a, b) coefficient arrays for the multiply-shift universal
    family h_i(x) = a_i * x + b_i (mod 2^64) — fully vectorizable in
    uint64 (numpy wrap-around), no big-int arithmetic. a_i forced odd
    (multiply-shift requirement)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**63 - 1, size=num_perm).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 2**63 - 1, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signature(tokens: list[str], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a token set; one
    vectorized (num_perm, n) uint64 pass."""
    if not tokens:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    hv = _token_hashes(list(set(tokens)))
    with np.errstate(over="ignore"):
        vals = a[:, None] * hv[None, :] + b[:, None]
    return np.min(vals, axis=1)


def lsh_band_keys(sig: np.ndarray, bands: int) -> list[int]:
    """Split the signature into ``bands`` rows-per-band chunks and hash
    each chunk to a bucket key."""
    r = len(sig) // bands
    keys = []
    for bidx in range(bands):
        chunk = sig[bidx * r : (bidx + 1) * r].tobytes()
        h = hashlib.blake2b(chunk, digest_size=8).digest()
        keys.append(int.from_bytes(h, "little") & 0x7FFFFFFFFFFFFFFF)
    return keys


def simhash64(tokens: list[str]) -> int:
    """Charikar 64-bit SimHash over token multiset."""
    if not tokens:
        return 0
    hv = _token_hashes(tokens)
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    return int("".join("1" if x > 0 else "0" for x in v[::-1]), 2)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))
