"""Beyond-the-guard exchange fallbacks must equal the broadcast/driver
paths (VERDICT r02 next-round #3/#4): dedup_exact winner combine and
the events->orders as-of join."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_dedup_exact_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.dedup_exact(SF).to_pandas())
    monkeypatch.setattr(steps, "DEDUP_WINNERS_DRIVER_LIMIT", 0)
    exch = _canon(steps.dedup_exact(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) > 0


def test_events_asof_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.events_asof_orders(SF).to_pandas())
    monkeypatch.setattr(steps, "ORDERS_BROADCAST_LIMIT", 0)
    exch = _canon(steps.events_asof_orders(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) > 0


def test_docs_join_embeddings_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.docs_join_embeddings(SF).to_pandas())
    monkeypatch.setattr(steps, "JOIN_BROADCAST_LIMIT", 0)
    exch = _canon(steps.docs_join_embeddings(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) > 0


def test_filter_unprocessed_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.filter_unprocessed(SF).to_pandas())
    monkeypatch.setattr(steps, "JOIN_BROADCAST_LIMIT", 0)
    exch = _canon(steps.filter_unprocessed(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) > 0


def test_revenue_by_nation_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.revenue_by_nation(SF).to_pandas())
    monkeypatch.setattr(steps, "CUSTOMER_BROADCAST_LIMIT", 0)
    exch = _canon(steps.revenue_by_nation(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) == 25


def test_exchange_root_env_override(ray_session, tmp_path, monkeypatch):
    from neurostore_text_extraction_ray.stages import exchange as ex

    monkeypatch.setenv("NSE_EXCHANGE_ROOT", str(tmp_path / "xroot"))
    stage = ex.make_stage("nse_test_")
    assert stage.startswith(str(tmp_path / "xroot"))


def test_decontaminate_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines.extras import (
        _docs_decontaminate)
    from neurostore_text_extraction_ray.stages import decontam

    drv = _canon(_docs_decontaminate(SF).to_pandas())
    monkeypatch.setattr(decontam, "DECON_BROADCAST_LIMIT", 0)
    exch = _canon(_docs_decontaminate(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) == 500
    # the benchmark docs overlap themselves: all flagged
    flagged = set(drv[drv["contaminated"]]["doc_id"])
    assert set(range(0, 500, 50)) <= flagged


def test_top_terms_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.top_terms(SF).to_pandas())
    monkeypatch.setattr(steps, "TERMS_DRIVER_LIMIT", 0)
    exch = _canon(steps.top_terms(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) == 20


def test_domain_stats_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.docs_domain_stats(SF).to_pandas())
    monkeypatch.setattr(steps, "DOMAIN_DRIVER_LIMIT", 0)
    exch = _canon(steps.docs_domain_stats(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    # seven head domains + the doc_id % 11 singleton tail
    assert (drv["n_docs"] > 1).sum() == 7
    assert (drv["n_docs"] == 1).any()


def test_lineitem_agg_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.lineitem_agg(SF).to_pandas())
    monkeypatch.setattr(steps, "AGG_PARTIALS_DRIVER_LIMIT", 0)
    exch = _canon(steps.lineitem_agg(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) == 6


def test_lineitem_rollup_exchange_equivalence(ray_session, monkeypatch):
    """ROLLUP lattice: exchange path equals the driver path; the three
    levels are internally consistent (each subtotal is the exact int
    sum of its children; grand total = corpus row count)."""
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.lineitem_rollup(SF).to_pandas())
    monkeypatch.setattr(steps, "AGG_PARTIALS_DRIVER_LIMIT", 0)
    exch = _canon(steps.lineitem_rollup(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    finest = drv[drv["l_linestatus"].notna()]
    flags = drv[drv["l_returnflag"].notna() & drv["l_linestatus"].isna()]
    grand = drv[drv["l_returnflag"].isna()]
    assert len(finest) == 6 and len(flags) == 3 and len(grand) == 1
    per_flag = finest.groupby("l_returnflag")["n_rows"].sum()
    for _, r in flags.iterrows():
        assert int(r["n_rows"]) == int(per_flag[r["l_returnflag"]])
    assert int(grand["n_rows"].iloc[0]) == int(finest["n_rows"].sum())


def test_lineitem_cube_exchange_equivalence(ray_session, monkeypatch):
    """CUBE lattice: exchange path equals the driver path; CUBE =
    ROLLUP plus an internally-consistent per-status level (its
    subtotals are the exact int sums of the finest level's columns)."""
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.lineitem_cube(SF).to_pandas())
    monkeypatch.setattr(steps, "AGG_PARTIALS_DRIVER_LIMIT", 0)
    exch = _canon(steps.lineitem_cube(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    finest = drv[drv["l_returnflag"].notna() & drv["l_linestatus"].notna()]
    states = drv[drv["l_returnflag"].isna() & drv["l_linestatus"].notna()]
    assert len(finest) == 6 and len(states) == 2 and len(drv) == 12
    per_status = finest.groupby("l_linestatus")["n_rows"].sum()
    for _, r in states.iterrows():
        assert int(r["n_rows"]) == int(per_status[r["l_linestatus"]])


def test_customer_order_counts_exchange_equivalence(ray_session, monkeypatch):
    """LEFT OUTER zero-fill join: the co-partitioned exchange path
    (both gates patched to 0 — aggregate combine AND join broadcast)
    equals the broadcast path; zero-order customers keep their rows
    with exact 0 / 0.0 fills."""
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.customer_order_counts(SF).to_pandas())
    monkeypatch.setattr(steps, "AGG_PARTIALS_DRIVER_LIMIT", 0)
    monkeypatch.setattr(steps, "ORDER_COUNTS_BROADCAST_LIMIT", 0)
    exch = _canon(steps.customer_order_counts(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) == 150  # every customer kept (outer semantics)
    zero = drv[drv["n_orders"] == 0]
    assert len(zero) > 0
    assert (zero["total_spent"] == 0.0).all()


def test_events_hourly_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.events_hourly(SF).to_pandas())
    monkeypatch.setattr(steps, "AGG_PARTIALS_DRIVER_LIMIT", 0)
    exch = _canon(steps.events_hourly(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) > 0
    assert int(drv["n_events"].sum()) == 1000  # every sf0.001 event counted once


def test_domain_filter_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.docs_domain_filter(SF).to_pandas())
    monkeypatch.setattr(steps, "DOMAIN_DRIVER_LIMIT", 0)
    exch = _canon(steps.docs_domain_filter(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    # every tail singleton dropped, every kept domain is a head domain
    assert len(drv) > 0
    assert drv["domain"].str.startswith("site").all()


# ---------------------------------------------------------------------------
# Multi-node dress rehearsal (VERDICT r04 #7): the exchange validates
# its shared-storage precondition at execution time, runs correctly
# against an explicit shared root while a second node is simulated, and
# every non-exchange fragment writer carries the same validation.
# ---------------------------------------------------------------------------


def _fake_two_nodes(monkeypatch):
    import ray

    monkeypatch.setattr(
        ray, "nodes",
        lambda: [{"Alive": True, "NodeID": "a"},
                 {"Alive": True, "NodeID": "b"}])


def test_exchange_multinode_guard_raises(ray_session, monkeypatch):
    """Simulated second node + no NSE_EXCHANGE_ROOT: the exchange path
    must fail loudly at stage creation, not silently drop rows."""
    from neurostore_text_extraction_ray.pipelines import steps
    from neurostore_text_extraction_ray.stages import exchange as ex

    monkeypatch.delenv("NSE_EXCHANGE_ROOT", raising=False)
    _fake_two_nodes(monkeypatch)
    with pytest.raises(RuntimeError, match="shared"):
        ex._assert_single_node()
    monkeypatch.setattr(steps, "DOMAIN_DRIVER_LIMIT", 0)
    with pytest.raises(RuntimeError, match="shared"):
        steps.docs_domain_stats(SF).to_pandas()


def test_exchange_shared_root_multinode_rehearsal(ray_session, tmp_path,
                                                  monkeypatch):
    """Simulated second node WITH a shared exchange root: the run
    proceeds, every stage dir lands under the root, and the result
    equals the single-node driver path."""
    from neurostore_text_extraction_ray.pipelines import steps
    from neurostore_text_extraction_ray.stages import exchange as ex

    drv = _canon(steps.docs_domain_stats(SF).to_pandas())
    root = tmp_path / "shared_x"
    monkeypatch.setenv("NSE_EXCHANGE_ROOT", str(root))
    _fake_two_nodes(monkeypatch)
    made = []
    real_make = ex.make_stage

    def recording_make(prefix):
        s = real_make(prefix)
        made.append(s)
        return s

    monkeypatch.setattr(ex, "make_stage", recording_make)
    monkeypatch.setattr(steps, "DOMAIN_DRIVER_LIMIT", 0)
    exch = _canon(steps.docs_domain_stats(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert made and all(s.startswith(str(root)) for s in made)


def test_shared_visibility_guard(ray_session, monkeypatch):
    """Non-exchange fragment writers (flagship run dir, incremental
    state): multi-node without the NSE_SHARED_STORAGE promise raises;
    with it (or single-node) it is a no-op."""
    from neurostore_text_extraction_ray.stages import exchange as ex

    monkeypatch.delenv("NSE_SHARED_STORAGE", raising=False)
    monkeypatch.setattr(ex, "_VIS_CHECKED", False)
    ex.assert_shared_visibility("x")  # single-node: no-op (and memoizes)
    assert ex._VIS_CHECKED  # passed check cached per process (hot path)
    _fake_two_nodes(monkeypatch)
    # a PASSED single-node check is memoized for the process lifetime —
    # a node joining mid-job is caught by its own workers' first-batch
    # checks, so the fresh-process behavior is what matters:
    monkeypatch.setattr(ex, "_VIS_CHECKED", False)
    with pytest.raises(RuntimeError, match="NSE_SHARED_STORAGE"):
        ex.assert_shared_visibility("flagship stage dir")
    monkeypatch.setenv("NSE_SHARED_STORAGE", "1")
    ex.assert_shared_visibility("flagship stage dir")


def test_fragment_writers_route_through_validation():
    """Static invariant: every module that writes part= fragment dirs
    either routes rows through write_exchange (whose execution-time
    check runs on driver and workers) or calls
    assert_shared_visibility itself."""
    import glob
    import os

    import neurostore_text_extraction_ray as pkg

    pkg_dir = os.path.dirname(pkg.__file__)
    offenders = []
    for path in glob.glob(f"{pkg_dir}/**/*.py", recursive=True):
        if path.endswith(os.path.join("stages", "exchange.py")):
            continue
        src = open(path).read()
        writes = 'f"part={' in src and "os.makedirs(frag_dir" in src
        if writes and "write_exchange" not in src \
                and "assert_shared_visibility" not in src:
            offenders.append(path)
    assert not offenders, offenders


def test_docs_domain_cap_semantics(ray_session):
    """Per-domain cap: at most `cap` docs per domain, chosen by the
    sampling hash then doc_id; kept set invariant to the part count."""
    from neurostore_text_extraction_ray.pipelines import steps

    out = _canon(steps.docs_domain_cap(SF, cap=3).to_pandas())
    per_dom = out.groupby("domain").size()
    assert (per_dom <= 3).all()
    # head domains (>= 5 docs each at sf0.001) hit the cap exactly
    heads = per_dom[per_dom.index.str.startswith("site")]
    assert len(heads) == 7 and (heads == 3).all()
    # tail singletons survive untouched
    tails = per_dom[per_dom.index.str.startswith("tail")]
    assert (tails == 1).all()
    # deterministic + independent of partitioning
    out1 = _canon(steps.docs_domain_cap(SF, cap=3, num_parts=1).to_pandas())
    pd.testing.assert_frame_equal(out, out1)
    # the chosen ids are the hash-minimal ones per domain (spot-check)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    dom0 = ids[(ids % 11 != 0) & (ids % 7 == 0)]
    h = (dom0 * 2654435761) % (1 << 31) % (1 << 20)
    expect = set(dom0[np.lexsort((dom0, h))][:3])
    got = set(out[out["domain"] == "site0.example"]["doc_id"])
    assert got == expect


def test_tfidf_df_combine_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.tfidf(SF).to_pandas())
    monkeypatch.setattr(steps, "TERMS_DRIVER_LIMIT", 0)
    exch = _canon(steps.tfidf(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) > 0


def test_tfidf_vocab_budget_raises(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    monkeypatch.setattr(steps, "TFIDF_VOCAB_DRIVER_LIMIT", 0)
    with pytest.raises(RuntimeError, match="broadcast budget"):
        steps.tfidf(SF).to_pandas()


def test_distinct_langs_exchange_equivalence(ray_session, monkeypatch):
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.distinct_langs(SF).to_pandas())
    monkeypatch.setattr(steps, "AGG_PARTIALS_DRIVER_LIMIT", 0)
    exch = _canon(steps.distinct_langs(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) == 5


def test_topk_combine_exchange_equivalence(ray_session, monkeypatch):
    """The three partial top-k merges (global, per-group, weighted
    priority) beyond the driver budget equal the driver path."""
    from neurostore_text_extraction_ray.pipelines import steps

    drv = {
        "bylen": _canon(steps.top_docs_by_length(SF).to_pandas()),
        "perlang": _canon(steps.top_docs_per_lang(SF).to_pandas()),
        "weighted": _canon(steps.docs_sample_weighted(SF).to_pandas()),
    }
    monkeypatch.setattr(steps, "TOPK_PARTIALS_DRIVER_LIMIT", 0)
    pd.testing.assert_frame_equal(
        drv["bylen"], _canon(steps.top_docs_by_length(SF).to_pandas()))
    pd.testing.assert_frame_equal(
        drv["perlang"], _canon(steps.top_docs_per_lang(SF).to_pandas()))
    pd.testing.assert_frame_equal(
        drv["weighted"], _canon(steps.docs_sample_weighted(SF).to_pandas()))
    assert len(drv["bylen"]) == 10 and len(drv["weighted"]) == 100


def test_training_mix_dedup_exchange_equivalence(ray_session, monkeypatch):
    """The composite training-mix pipeline's embedded winner combine
    beyond the budget routes through dedup_exact's exchange and stays
    byte-equal."""
    from neurostore_text_extraction_ray.pipelines import steps
    from neurostore_text_extraction_ray.pipelines.extras import (
        _docs_training_mix)

    drv = _canon(_docs_training_mix(SF).to_pandas())
    monkeypatch.setattr(steps, "DEDUP_WINNERS_DRIVER_LIMIT", 0)
    exch = _canon(_docs_training_mix(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) > 0


def test_key_part_negative_zero_colocates():
    """-0.0 == 0.0 in a groupby, so they must hash to the same part."""
    import pyarrow as pa

    from neurostore_text_extraction_ray.pipelines.steps import _key_part

    t = pa.table({"k": pa.array([0.0, -0.0, 1.5, -1.5], pa.float64())})
    parts = _key_part(t, ["k"], 32)
    assert parts[0] == parts[1]


def test_grouped_sum_null_keys_kept(ray_session):
    """SQL GROUP BY keeps NULL keys; the shared combine must too, on
    BOTH the driver and the exchange path (pandas groupby's default
    dropna=True silently dropped them — regression)."""
    import pyarrow as pa
    import ray.data as rd

    from neurostore_text_extraction_ray.pipelines.steps import (
        grouped_sum_by_key)

    partials = rd.from_arrow(pa.table({
        "lang": pa.array(["en", None, "de", None, "en"], pa.string()),
        "n": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "b0": pa.array([0, 1, 2, 3, 4], pa.int64()),
    }))
    for limit in (10**9, 0):  # driver path, then exchange path
        out = grouped_sum_by_key(partials, "lang", ["n"], limit)
        df = out.to_pandas()
        null_rows = df[df["lang"].isna()]
        assert len(null_rows) == 1, f"limit={limit}: null key dropped"
        assert int(null_rows["n"].iloc[0]) == 6
        assert int(df["n"].sum()) == 15 and len(df) == 3


def test_lang_quantiles_exchange_equivalence(ray_session, monkeypatch):
    """Grouped quantile_disc: beyond-the-gate lang-hash exchange path
    equals the driver combine, and both equal an in-memory pandas
    re-derivation of the ceil(q*n) rule."""
    import math

    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.docs_lang_quantiles(SF).to_pandas())
    monkeypatch.setattr(steps, "LANG_QUANTILES_DRIVER_LIMIT", 0)
    exch = _canon(steps.docs_lang_quantiles(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) > 0

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "n_chars"])
    rows = []
    for lang, g in docs.groupby("lang"):
        v = np.sort(g["n_chars"].to_numpy())
        for q in (0.25, 0.5, 0.75, 0.95):
            rows.append({"lang": lang, "q": q,
                         "value": int(v[max(1, math.ceil(q * len(v))) - 1])})
    want = _canon(pd.DataFrame(rows))
    pd.testing.assert_frame_equal(drv, want)


def test_user_retention_exchange_equivalence(ray_session, monkeypatch):
    """Beyond-the-gate user-hash exchange path equals the driver
    kernel, and both equal an in-memory pandas re-derivation."""
    from neurostore_text_extraction_ray.pipelines import steps

    drv = _canon(steps.events_user_retention(SF).to_pandas())
    monkeypatch.setattr(steps, "USER_DAYS_DRIVER_LIMIT", 0)
    exch = _canon(steps.events_user_retention(SF).to_pandas())
    pd.testing.assert_frame_equal(drv, exch)
    assert len(drv) > 0 and (drv["n_retained_next"] <= drv["n_active"]).all()

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "user_id"])
    ev["day"] = ev["ts"].dt.floor("D")
    ud = ev[["user_id", "day"]].drop_duplicates()
    nxt = ud.assign(day=ud["day"] - pd.Timedelta(days=1), r=1)
    j = ud.merge(nxt, on=["user_id", "day"], how="left")
    want = (j.groupby("day").agg(n_active=("user_id", "size"),
                                 r=("r", "sum")).reset_index())
    want["n_retained_next"] = want.pop("r").astype("int64")
    pd.testing.assert_frame_equal(drv, _canon(want))
