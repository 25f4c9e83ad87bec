"""Distributed sketches (training-data-pipeline additions; custom
operators per the SURVEY guidance for semantics Ray Data lacks):

- HyperLogLog distinct counting (Flajolet et al. 2007, public
  algorithm): per-batch register partials -> tiny elementwise-max
  combine -> bias-corrected estimate. The registers are 2^p bytes per
  PARTIAL (not per row), so a 10^12-row column reduces to a handful of
  4 KB blobs on the driver regardless of cardinality — the canonical
  sketch shape for web-scale "how many distinct urls/tokens" questions.
  Deterministic given the hash (pd.util.hash_array, fixed key), so the
  estimate is pinned by a golden oracle.

- Bloom-prefiltered broadcast semi-join: the small side builds a bit
  array (vectorized double hashing) that is broadcast alongside the
  sorted key array; each batch probes the bloom first (k uint64 ops per
  row over a few-hundred-KB filter) and runs the exact searchsorted
  verify only on survivors. Output is EXACTLY the semi-join (the bloom
  is a pruning layer, false positives removed by the verify), so the
  operator keeps a plain SQL oracle while modeling the
  bandwidth-saving probe order used at scale.

- Count-Min heavy hitters (Cormode-Muthukrishnan 2005, public
  algorithm): bounded-memory approximate top-k terms at unbounded
  vocabulary — the scale path past ``steps.top_terms``'s
  vocabulary-bounded exact combine. Deterministic (blake2b term
  hashes + splitmix64 row derivation), mergeable (blobs sum),
  overestimate-only; pinned by a golden oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Self-owned vectorized 64-bit mixer (public splitmix64 finalizer,
    full avalanche) — used for HLL hashing of integer columns so the
    pinned estimate golden cannot shift under a pandas upgrade
    (ADVICE r03: pd.util.hash_array internals are not a stable
    contract)."""
    z = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = z + _MIX1
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0)."""
    v = v.copy()
    bl = np.zeros(len(v), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl[v > 0] += 1
    return bl


def hll_partial(hashes: np.ndarray, p: int) -> np.ndarray:
    """uint64 hashes -> register array (uint8[2^p]) of max rho."""
    m = 1 << p
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    # payload shifted to the TOP of the 64-bit word, so leading zeros
    # of w == leading zeros of the (64-p)-bit payload string:
    # rho = 64 - bit_length(w) + 1 (w == 0 -> payload all zeros ->
    # rho = 64 - p + 1, the maximum)
    w = (hashes << np.uint64(p)).astype(np.uint64)
    rho = np.where(w > 0, 64 - _bit_length_u64(w) + 1, 64 - p + 1)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected HLL estimate with the small-range (linear
    counting) correction — the published estimator, deterministic."""
    m = len(regs)
    # published alpha constants (Flajolet et al. 2007): small-m values
    # differ from the asymptotic formula
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return int(round(e))


def hll_distinct(ds, col: str, p: int = 12):
    """Approximate COUNT(DISTINCT col) over a Dataset: one register
    blob per batch, elementwise-max combine, single-row result
    ``(n_distinct_est)``."""
    import ray.data as rd

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        # COUNT(DISTINCT col) semantics: NULLs are not a value
        vals = np.asarray(batch[col].drop_null().to_numpy(zero_copy_only=False))
        if np.issubdtype(vals.dtype, np.integer):
            # self-owned mixer: estimate is pinned independent of the
            # pandas version (the golden-oracle coupling ADVICE r03 #4)
            h = splitmix64(vals)
        else:
            # non-integer columns fall back to pandas' stable siphash;
            # NOTE the pinned-golden coupling to the pandas version —
            # regenerate goldens (tools/make_goldens.py) on upgrade
            h = pd.util.hash_array(vals)
        regs = hll_partial(h, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    regs = np.zeros(m, dtype=np.uint8)
    for blob in partials["regs"]:
        regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
    est = hll_estimate(regs)
    return rd.from_arrow(pa.table({"n_distinct_est": pa.array([est], pa.int64())}))


# ---------------------------------------------------------------------------
# Bloom-prefiltered broadcast semi-join
# ---------------------------------------------------------------------------


def bloom_indices(keys: np.ndarray, n_bits: int, k_hashes: int):
    """Yield the ``k_hashes`` per-key bit-index arrays (double hashing:
    h_i = h1 + i*h2, the standard Kirsch-Mitzenmacher construction).
    ONE arithmetic shared by build, probe, and the sharded seen-set
    partial emitter — any drift between them would mean silent false
    negatives, so there is exactly one implementation."""
    k64 = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = k64 * _MIX1
        h1 ^= h1 >> np.uint64(29)
        h2 = (k64 ^ _MIX2) * _MIX1
        h2 ^= h2 >> np.uint64(31)
        h2 |= np.uint64(1)  # odd stride
        for i in range(k_hashes):
            yield ((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64)


def bloom_round_bits(n_bits: int) -> int:
    """Bits rounded UP to a multiple of 64 — the build modulus must
    always equal the probe-side ``len(words) * 64`` (a truncating build
    would index out of bounds or, worse, give the probe a different
    modulus -> false negatives)."""
    return max(64, ((n_bits + 63) // 64) * 64)


def build_bloom(keys: np.ndarray, n_bits: int = 1 << 20,
                k_hashes: int = 5) -> np.ndarray:
    """Vectorized Bloom filter over int64 keys. Returns a uint64 word
    array of ``bloom_round_bits(n_bits) / 64`` words."""
    n_bits = bloom_round_bits(n_bits)
    words = np.zeros(n_bits // 64, dtype=np.uint64)
    for idx in bloom_indices(keys, n_bits, k_hashes):
        np.bitwise_or.at(words, idx >> 6,
                         np.uint64(1) << (idx & 63).astype(np.uint64))
    return words


def bloom_contains(words: np.ndarray, keys: np.ndarray,
                   k_hashes: int = 5) -> np.ndarray:
    """Vectorized membership probe (no false negatives)."""
    n_bits = len(words) * 64
    out = np.ones(len(keys), dtype=bool)
    for idx in bloom_indices(keys, n_bits, k_hashes):
        bit = (words[idx >> 6] >> (idx & 63).astype(np.uint64)) & np.uint64(1)
        out &= bit.astype(bool)
    return out


_SHARD_SEED = np.uint64(0xA0761D6478BD642F)


def bloom_shard(keys: np.ndarray, num_shards: int) -> np.ndarray:
    """Deterministic shard id per key for the SHARDED seen-set filter —
    independent of the in-shard bit hashes (separate seed through
    splitmix64), so sharding never correlates with bit positions."""
    return (splitmix64(keys.astype(np.uint64) ^ _SHARD_SEED)
            % np.uint64(num_shards)).astype(np.int64)


def bloom_semi_join(fact_ds, key_col: str, keys: np.ndarray,
                    n_bits: int = 1 << 20, k_hashes: int = 5):
    """Keep fact rows whose ``key_col`` is in ``keys`` — bloom probe
    first, exact sorted-array verify on survivors only. Output equals
    the exact semi-join (plain SQL oracle); the bloom is the
    scale-path pruning layer (a few hundred KB broadcast instead of
    touching the full sorted key array for every row)."""
    import ray

    keys_sorted = np.unique(keys.astype(np.int64))  # unique() sorts
    ref = ray.put((build_bloom(keys_sorted, n_bits, k_hashes), keys_sorted))

    def f(batch: pa.Table) -> pa.Table:
        from .broadcast import get_broadcast

        words, ks = get_broadcast(ref)
        vals = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cand = bloom_contains(words, vals, k_hashes)
        if not cand.any():
            return batch.slice(0, 0)
        exact = np.zeros(len(vals), dtype=bool)
        cv = vals[cand]
        j = np.clip(np.searchsorted(ks, cv), 0, len(ks) - 1)
        exact[np.flatnonzero(cand)] = ks[j] == cv
        return batch.filter(pa.array(exact))

    return fact_ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-Min heavy hitters (approximate top-k terms at unbounded vocabulary)
# ---------------------------------------------------------------------------
#
# The exact ``steps.top_terms`` combine is bounded by vocabulary size;
# at web scale the vocabulary is unbounded, and the classic bounded-
# memory answer is a Count-Min sketch (Cormode-Muthukrishnan 2005,
# public construction) plus a candidate stream. Each batch emits
# (a) one depth*width int64 register blob and (b) its local exact
# top-``cand_per_batch`` terms; blobs sum elementwise (a streaming
# O(depth*width) driver reduction, same shape as the HLL max-combine),
# candidates union, and every candidate is estimated as
# min_d cms[d][idx_d(term)] — deterministic (blake2b term hashes +
# splitmix64 row derivation, no RNG), mergeable, overestimate-only.


def cms_partial(term_hashes: np.ndarray, counts: np.ndarray,
                width: int, depth: int) -> np.ndarray:
    """(depth*width,) int64 register block for one batch's
    (term-hash, count) pairs."""
    regs = np.zeros(depth * width, dtype=np.int64)
    for d in range(depth):
        idx = splitmix64(term_hashes ^ np.uint64(d * 0x9E3779B9)) \
            % np.uint64(width)
        np.add.at(regs, d * width + idx.astype(np.int64), counts)
    return regs


def cms_estimate(regs: np.ndarray, term_hashes: np.ndarray,
                 width: int, depth: int) -> np.ndarray:
    """Point estimates (min over depth rows) for each term hash."""
    est = np.full(len(term_hashes), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        idx = splitmix64(term_hashes ^ np.uint64(d * 0x9E3779B9)) \
            % np.uint64(width)
        est = np.minimum(est, regs[d * width + idx.astype(np.int64)])
    return est


def cms_top_terms(ds, text_col: str = "text", k: int = 20,
                  width: int = 1 << 14, depth: int = 4,
                  cand_per_batch: int = 256):
    """Approximate top-``k`` terms (SK_TOKEN_RE tokens, lowercased)
    by estimated count: ``(term, est_n)``, est desc then term asc.
    Register blobs are ``kind=0`` rows, candidates ``kind=1`` rows —
    the two-output-kinds-in-one-pass pattern of the minhash band==-1
    marker rows."""
    import ray.data as rd

    from ..functions import hashing as H
    from ..functions.textstats import SK_TOKEN_RE

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        toks = df[text_col].fillna("").str.lower().str.findall(SK_TOKEN_RE)
        c = toks.explode().dropna().value_counts()
        terms = c.index.to_numpy(dtype=object)
        counts = c.to_numpy().astype(np.int64)
        hs = H._token_hashes(list(terms))
        regs = cms_partial(hs, counts, width, depth)
        # deterministic candidate cut: (count desc, term asc) — a bare
        # value_counts slice breaks ties by hash-table insertion order,
        # which varies with batch formation
        order = np.lexsort((terms, -counts))[:cand_per_batch]
        cand = pd.DataFrame({
            "kind": np.ones(len(order), dtype=np.int64),
            "term": terms[order],
            "n": counts[order],
            "blob": None,
        })
        blob = pd.DataFrame({
            "kind": np.zeros(1, dtype=np.int64),
            "term": [""], "n": np.zeros(1, dtype=np.int64),
            "blob": [regs.tobytes()],
        })
        return pd.concat([blob, cand], ignore_index=True)

    regs = np.zeros(depth * width, dtype=np.int64)
    cand_terms: set[str] = set()
    # streaming O(depth*width) driver reduction: one blob in memory at
    # a time, never the full partial set
    for part in ds.map_batches(
            partial, batch_format="pandas").iter_batches(
                batch_format="pandas"):
        for blob in part.loc[part["kind"] == 0, "blob"]:
            regs += np.frombuffer(blob, dtype=np.int64)
        cand_terms.update(part.loc[part["kind"] == 1, "term"])
    terms = sorted(cand_terms)
    if terms:
        est = cms_estimate(regs, H._token_hashes(terms), width, depth)
        order = np.lexsort((np.array(terms, dtype=object), -est))[:k]
        out = pd.DataFrame({
            "term": np.array(terms, dtype=object)[order],
            "est_n": est[order],
        })
    else:
        out = pd.DataFrame({"term": pd.Series([], dtype=object),
                            "est_n": pd.Series([], dtype=np.int64)})
    return rd.from_pandas(out)
