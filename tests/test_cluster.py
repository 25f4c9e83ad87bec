"""Behavior tests for stages/cluster.py (kmeans_assign, semdedup,
knn_lsh) and the url canonicalization kernel.

The stored embeddings are RANDOM (labels carry no geometry — measured:
within-label cosine == cross-label cosine ~= 0), so geometric behavior
is asserted on synthetic clustered vectors planted here, and the
planted-copy corpus (extras._embeddings_with_planted_dups) covers the
dedup positive path.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _clustered_vectors(n_per=40, n_clusters=8, dim=32, noise=0.05, seed=7):
    """Well-separated unit-ish clusters: random orthogonal-ish centers
    plus small noise -> kmeans must recover membership exactly."""
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, labels = [], []
    for c in range(n_clusters):
        pts = centers[c] + noise * rng.standard_normal((n_per, dim))
        vecs.append(pts)
        labels.extend([c] * n_per)
    v = np.concatenate(vecs)
    return v, np.array(labels)


def _as_ds(vecs: np.ndarray, ids=None):
    import ray.data as rd

    if ids is None:
        ids = np.arange(len(vecs), dtype=np.int64)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    return rd.from_arrow(t).repartition(4)


def test_kmeans_recovers_planted_clusters(ray_session):
    from neurostore_text_extraction_ray.stages.cluster import kmeans_assign

    vecs, labels = _clustered_vectors()
    out = kmeans_assign(_as_ds(vecs), n_clusters=8).to_pandas()
    assert len(out) == len(vecs)
    df = out.sort_values("vec_id").reset_index(drop=True)
    df["label"] = labels
    # each true cluster maps onto exactly one kmeans cell and cells
    # don't merge (separation >> noise)
    purity = df.groupby("label")["cluster_id"].nunique()
    assert (purity == 1).all()
    assert df["cluster_id"].nunique() == 8


def test_kmeans_batch_size_invariant(ray_session):
    from neurostore_text_extraction_ray.stages.cluster import kmeans_assign

    vecs, _ = _clustered_vectors(n_per=10)
    a = (kmeans_assign(_as_ds(vecs), n_clusters=4).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b_ds = _as_ds(vecs).repartition(13)
    b = (kmeans_assign(b_ds, n_clusters=4).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_semdedup_drops_planted_copies(ray_session):
    from neurostore_text_extraction_ray.pipelines.extras import (
        _embeddings_semdedup,
    )

    out = _embeddings_semdedup(SF).to_pandas()
    assert len(out) == 520
    planted = out[out["vec_id"] >= 100000].sort_values("vec_id")
    assert len(planted) == 20
    # every planted copy is dropped as a dup of exactly its original
    assert not planted["keep"].any()
    assert (planted["dup_of"].to_numpy()
            == planted["vec_id"].to_numpy() - 100000).all()
    assert (planted["max_sim"] > 0.999).all()
    # random originals survive at 0.99 (measured max cross-cos ~ 0.48)
    originals = out[out["vec_id"] < 100000]
    assert originals["keep"].all()


def test_semdedup_threshold_and_locality(ray_session):
    """Near-identical vectors collapse; distinct clusters survive; a
    copy and its original always land in the same cluster."""
    from neurostore_text_extraction_ray.stages.cluster import semdedup

    vecs, labels = _clustered_vectors(n_per=6, n_clusters=4, noise=0.01)
    # duplicate every 3rd vector exactly, under id + 10000
    dup_idx = np.arange(0, len(vecs), 3)
    all_vecs = np.concatenate([vecs, vecs[dup_idx]])
    ids = np.concatenate([np.arange(len(vecs)), dup_idx + 10000])
    out = semdedup(_as_ds(all_vecs, ids), n_clusters=4,
                   threshold=0.999).to_pandas()
    byid = out.set_index("vec_id")
    for i in dup_idx:
        assert not byid.loc[i + 10000, "keep"]
        assert byid.loc[i + 10000, "dup_of"] == i
        assert byid.loc[i + 10000, "cluster_id"] == byid.loc[i, "cluster_id"]
    # at noise=0.01 within-cluster non-copies stay below 0.999 cosine
    kept = out[out["vec_id"] < 10000]
    assert kept["keep"].all()


def test_semdedup_cluster_limit_path_equivalence():
    """The blockwise kernel (cluster larger than SEMDEDUP_CLUSTER_LIMIT)
    must reproduce the single-matmul path exactly: keep/dup_of
    byte-identical, max_sim equal to BLAS-blocking tolerance. Mix of
    exact copies, near-dups around the threshold, and distinct rows."""
    from neurostore_text_extraction_ray.stages.cluster import (
        _semdedup_cluster,
    )

    rng = np.random.RandomState(11)
    base = rng.standard_normal((40, 16))
    near = base[::4] + 0.001 * rng.standard_normal((10, 16))
    vecs = np.concatenate([base, base[::3], near])
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = rng.permutation(len(vecs)).astype(np.int64)
    full = _semdedup_cluster(ids.copy(), vecs.copy(), 0.99,
                             block=len(vecs) + 1)
    for blk in (1, 3, 7):
        blocked = _semdedup_cluster(ids.copy(), vecs.copy(), 0.99,
                                    block=blk)
        pd.testing.assert_frame_equal(
            blocked[["vec_id", "keep", "dup_of"]],
            full[["vec_id", "keep", "dup_of"]])
        np.testing.assert_allclose(
            blocked["max_sim"], full["max_sim"], rtol=0, atol=1e-12)


def test_semdedup_limit_patched_end_to_end(ray_session, monkeypatch):
    """Patch SEMDEDUP_CLUSTER_LIMIT to 3 (every fixture cluster
    overflows it) and assert the planted-dup query output is unchanged
    — the budget-gate path-equivalence pattern of the other operators."""
    from neurostore_text_extraction_ray.pipelines.extras import (
        _embeddings_semdedup,
    )
    from neurostore_text_extraction_ray.stages import cluster

    full = (_embeddings_semdedup(SF).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    monkeypatch.setattr(cluster, "SEMDEDUP_CLUSTER_LIMIT", 3)
    capped = (_embeddings_semdedup(SF).to_pandas()
              .sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        capped[["vec_id", "cluster_id", "keep", "dup_of"]],
        full[["vec_id", "cluster_id", "keep", "dup_of"]])
    np.testing.assert_allclose(
        capped["max_sim"], full["max_sim"], rtol=0, atol=1e-12)


def test_semdedup_auto_n_clusters(ray_session):
    """n_clusters=None scales the cluster count with the corpus and
    still collapses exact planted copies onto their originals."""
    from neurostore_text_extraction_ray.stages import cluster
    from neurostore_text_extraction_ray.stages.cluster import semdedup

    vecs, _ = _clustered_vectors(n_per=6, n_clusters=4, noise=0.01)
    dup_idx = np.arange(0, len(vecs), 3)
    all_vecs = np.concatenate([vecs, vecs[dup_idx]])
    ids = np.concatenate([np.arange(len(vecs)), dup_idx + 10000])
    out = semdedup(_as_ds(all_vecs, ids), n_clusters=None,
                   threshold=0.999).to_pandas()
    # 32 rows / 4096 target -> 1 cluster; the dedup still lands exactly
    assert out["cluster_id"].nunique() == 1
    byid = out.set_index("vec_id")
    for i in dup_idx:
        assert not byid.loc[i + 10000, "keep"]
        assert byid.loc[i + 10000, "dup_of"] == i
    assert cluster.SEMDEDUP_TARGET_CLUSTER_ROWS > 0


def test_semdedup_greedy_chain_is_deterministic():
    """Driver-side check of the greedy kernel: in a chain a-b-c where
    consecutive sims pass the threshold, the lowest id wins and later
    members attach to the KEPT winner, not to each other."""
    from neurostore_text_extraction_ray.stages.cluster import (
        _semdedup_cluster,
    )

    base = np.array([1.0, 0.0, 0.0])
    rot = np.array([0.9999, 0.0141, 0.0])
    rot2 = np.array([0.9997, 0.0245, 0.0])
    unit = np.stack([base, rot / np.linalg.norm(rot),
                     rot2 / np.linalg.norm(rot2)])
    res = _semdedup_cluster(np.array([5, 9, 7], dtype=np.int64), unit[[0, 2, 1]],
                            threshold=0.999)
    res = res.set_index("vec_id")
    assert res.loc[5, "keep"] and res.loc[5, "dup_of"] == -1
    assert not res.loc[7, "keep"] and res.loc[7, "dup_of"] == 5
    assert not res.loc[9, "keep"] and res.loc[9, "dup_of"] == 5


def test_knn_lsh_recall_and_pruning(ray_session):
    """On clustered data LSH must (a) recover most of the brute-force
    top-k and (b) actually prune: candidates << full scan."""
    from neurostore_text_extraction_ray.stages.cluster import knn_lsh
    from neurostore_text_extraction_ray.stages.similarity import (
        knn_brute_force,
    )

    vecs, _ = _clustered_vectors(n_per=60, n_clusters=6, noise=0.1, seed=3)
    ds = _as_ds(vecs)
    qids = [0, 100, 250]
    q = vecs[qids]
    exact = knn_brute_force(ds, q, qids, k=10).to_pandas()
    approx, (n_cand, n_tot) = knn_lsh(_as_ds(vecs), q, qids, k=10,
                                      with_stats=True)
    recalls = []
    for qid in qids:
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # same-cluster neighbours share sign buckets with high probability
    assert np.mean(recalls) >= 0.8, recalls
    # pruning is real: the clustered queries scan well under the corpus
    assert n_cand < 0.6 * n_tot, (n_cand, n_tot)
    # every query at least finds itself at score ~1
    self_rows = approx[approx["vec_id"] == approx["query_id"]]
    assert len(self_rows) == len(qids)
    assert (self_rows["score"] > 0.9999).all()


def test_knn_lsh_stats_path_equals_plain(ray_session):
    from neurostore_text_extraction_ray.stages.cluster import knn_lsh

    vecs, _ = _clustered_vectors(n_per=15, n_clusters=4)
    qids = [1, 20]
    q = vecs[qids]
    plain = (knn_lsh(_as_ds(vecs), q, qids, k=5).to_pandas()
             .sort_values(["query_id", "vec_id"]).reset_index(drop=True))
    stats, _ = knn_lsh(_as_ds(vecs), q, qids, k=5, with_stats=True)
    stats = (stats.sort_values(["query_id", "vec_id"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(plain, stats)


@pytest.mark.parametrize("raw,canon", [
    ("HTTPS://WWW.Ex.COM:443//a//b/", "https://www.ex.com/a/b"),
    ("http://Host:80/x#frag", "http://host/x"),
    ("https://h.example/p/?utm_source=t&id=3", "https://h.example/p?id=3"),
    ("https://h.example/p?utm_only=1", "https://h.example/p"),
    ("https://h.example:8080/p", "https://h.example:8080/p"),
    # the trailing-slash rule also strips the bare root slash: host
    # and host/ are the same resource, so they SHOULD share a key
    ("https://h.example/", "https://h.example"),
    ("http://h/UP/case", "http://h/UP/case"),
])
def test_canonicalize_urls_cases(raw, canon):
    from neurostore_text_extraction_ray.functions.urlnorm import (
        canonicalize_urls,
    )

    assert canonicalize_urls(pd.Series([raw])).iloc[0] == canon


def test_url_host():
    from neurostore_text_extraction_ray.functions.urlnorm import url_host

    s = pd.Series(["HTTPS://A.B.C:443/x", "nota url", None])
    assert list(url_host(s)) == ["a.b.c", "", ""]
