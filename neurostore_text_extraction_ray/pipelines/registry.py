"""Operator registry + YAML pipeline config (SURVEY §2.10).

Reference surface: any class exported in ``ns_extract.pipelines.__all__``
is auto-exposed to the CLI under its snake-case name
(``pipelines/__init__.py:11-21``, ``cli/run.py:13-33``); YAML configs
are a list of ``{name, args}`` entries (``cli/run.py:36-92``).

Here an operator is registered with ``@register_op("name")`` and is a
function ``(sf_dir_or_ds, **kwargs) -> Dataset``. ``run_config`` runs a
YAML config of the shape:

    pipelines:
      - name: word_count
        args: {}
      - name: tfidf
        args: {min_df: 2}

writing each result under ``<out>/<name>/<version>/<config-hash>/`` —
the reference's versioned, hash-addressed output layout
(``dataset.py:254-265``)."""

from __future__ import annotations

import os
import re
from collections.abc import Callable

from ..functions.hashing import config_hash

_REGISTRY: dict[str, dict] = {}


def camel_to_snake(name: str) -> str:
    """CamelCase -> snake_case (cli/run.py:21-26 parity)."""
    s1 = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    return re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s1).lower()


def register_op(name: str, version: str = "1.0.0", dependent: bool = False,
                input_pipelines: list[str] | None = None):
    """``dependent=True`` marks corpus-global operators (reference
    DependentPipeline, base.py:536-669): their config hash incorporates
    the INPUT IDENTITY (dataset membership analog, base.py:646-669), so
    a changed corpus lands in a fresh hash dir instead of silently
    reusing stale results.

    ``input_pipelines`` declares pipeline-on-pipeline dependencies
    (reference ``_input_pipelines``, base.py:94-108): at run time each
    named upstream's latest version/config output dir is resolved
    (``pond.resolve_pipeline_dir``, the add_pipeline analog) and passed
    to the op as ``upstream_dirs={name: dir}``."""

    def deco(fn: Callable):
        _REGISTRY[name] = {
            "fn": fn, "version": version, "dependent": dependent,
            "input_pipelines": list(input_pipelines or []),
        }
        return fn

    return deco


def get_op(name: str) -> Callable:
    return _REGISTRY[name]["fn"]


def list_ops() -> dict[str, str]:
    return {k: v["version"] for k, v in sorted(_REGISTRY.items())}


def load_config(path: str) -> list[tuple[str, dict]]:
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    entries = cfg["pipelines"] if isinstance(cfg, dict) else cfg
    out = []
    for e in entries:
        if isinstance(e, str):
            out.append((e, {}))
        else:
            out.append((e["name"], e.get("args") or {}))
    return out


def run_entries(entries: list[tuple[str, dict]], sf_dir: str, out_dir: str,
                post_process=True, overwrite: bool = False) -> dict[str, str]:
    """Run pipelines into the versioned hash-dir layout with the
    reference's post-process / overwrite interplay
    (``cli/run.py:156-216``, ``base.py:174-215``):

    - ``post_process=True`` (default): full run; an existing output dir
      is SKIPPED unless ``overwrite`` (the \"No studies need
      processing\" short-circuit analog, base.py:157-162).
    - ``post_process=False``: ops that declare a post-process stage run
      without it (raw transform output only).
    - ``post_process='only'``: no re-extraction — ops re-post-process
      their EXISTING output in place (raw-results-first fallback,
      base.py:174-215); ops without a post-process stage are skipped.

    Returns {name: output_dir}."""
    import glob as _glob
    import inspect

    from ..state.manifest import input_fingerprint

    from ..exceptions import ConfigurationError

    results = {}
    for name, kwargs in entries:
        if name not in _REGISTRY:
            raise ConfigurationError(
                f"unknown pipeline '{name}' (registered: "
                f"{', '.join(sorted(_REGISTRY))})"
            )
        entry = _REGISTRY[name]
        hash_input = {"name": name, **kwargs}
        if entry.get("dependent"):
            hash_input["input_fingerprint"] = input_fingerprint(sf_dir)
        # resolve declared upstream-pipeline outputs (J1/S4 analog):
        # latest version + latest config under the SAME out_dir
        upstream_dirs = {}
        missing_upstream = None
        for up in entry.get("input_pipelines", []):
            from ..sources.pond import resolve_pipeline_dir

            d = resolve_pipeline_dir(out_dir, up)
            if d is None:
                missing_upstream = up
                break
            upstream_dirs[up] = d
        if missing_upstream is not None:
            # reference tolerates a missing upstream with a warning
            # (dataset.py:349-382); the dependent op is skipped
            results[name] = None
            continue
        if upstream_dirs:
            # hash the upstream CONTENT fingerprint, not the path: an
            # upstream overwritten in place (same dir, new data) must
            # invalidate this op's cache
            hash_input["upstream_fingerprints"] = {
                up: input_fingerprint(d) for up, d in upstream_dirs.items()
            }
        h = config_hash(hash_input)
        dest = os.path.join(out_dir, name, entry["version"], h)
        os.makedirs(dest, exist_ok=True)
        info_path = os.path.join(dest, "pipeline_info.json")
        existing = sorted(_glob.glob(os.path.join(dest, "*.parquet")))
        # a run is complete only once its pipeline_info.json landed
        # (written AFTER the data): a partially-moved dir from a killed
        # run must rerun, never be served as current
        complete = existing and os.path.exists(info_path)
        fn = entry["fn"]
        accepts_pp = "post_process" in inspect.signature(fn).parameters
        # post-process mode is NOT in the config hash (reference layout
        # parity), so the manifest records the output's post-processed
        # state and a complete dir whose state differs from the request
        # is RERUN, never served as current (ADVICE r02 #2)
        effective_pp = (post_process in (True, "only")) if accepts_pp else None
        pp_matches = True
        if complete and accepts_pp:
            import json as _json

            try:
                with open(info_path) as fh:
                    stored_pp = _json.load(fh).get("post_processed")
            except (OSError, _json.JSONDecodeError):
                # a corrupt/hand-edited manifest is unknown state: fall
                # back to rerun (the safe default this check exists to
                # provide) instead of crashing every subsequent run
                stored_pp = object()
            # a manifest WITHOUT the key (pre-upgrade dir) is unknown
            # state: rerun rather than risk serving raw output as
            # cleaned — the exact bug this check exists to close
            if stored_pp != effective_pp:
                pp_matches = False
        if upstream_dirs:
            kwargs = dict(kwargs, upstream_dirs=upstream_dirs)
        if post_process == "only":
            if not accepts_pp or not complete:
                # nothing to post-process (base.py:211-214 warns+returns)
                results[name] = dest
                continue
            ds = fn(sf_dir, **kwargs, post_process="only", prior_dir=dest)
        else:
            if complete and pp_matches and not overwrite:
                results[name] = dest  # idempotent rerun: skip
                continue
            call_kwargs = dict(kwargs)
            if accepts_pp:
                call_kwargs["post_process"] = post_process
            ds = fn(sf_dir, **call_kwargs)
        tmp = dest + ".tmp-run"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        # promotion order (ADVICE r02 #1): retract the completeness
        # marker FIRST, then replace data — any crash in the window
        # leaves the dir incomplete (no pipeline_info.json), forcing a
        # rerun instead of serving a mixed old/new dir as current
        if os.path.exists(info_path):
            os.remove(info_path)
        for f in existing:
            os.remove(f)
        for f in os.listdir(tmp):
            os.replace(os.path.join(tmp, f), os.path.join(dest, f))
        os.rmdir(tmp)
        # run-level manifest (S6) — also what makes this dir resolvable
        # as an upstream via resolve_pipeline_dir's latest-date rule
        from ..state.manifest import write_pipeline_info

        write_pipeline_info(dest, {
            "name": name, "version": entry["version"], "config_hash": h,
            "kwargs": {k: v for k, v in kwargs.items() if k != "upstream_dirs"},
            "upstream_dirs": upstream_dirs or None,
            "post_processed": effective_pp,
        })
        results[name] = dest
    return results


def run_config(config_path: str, sf_dir: str, out_dir: str,
               post_process=True, overwrite: bool = False) -> dict[str, str]:
    """Run every configured pipeline; returns {name: output_dir}.
    Output layout: <out>/<name>/<version>/<12-hex config hash>/part-*."""
    return run_entries(load_config(config_path), sf_dir, out_dir,
                       post_process=post_process, overwrite=overwrite)


def _register_builtins():
    from . import steps

    register_op("word_count")(steps.word_count)
    register_op("word_deviance", dependent=True)(steps.word_deviance)
    register_op("tfidf", dependent=True)(steps.tfidf)
    register_op("docs_en_quality")(steps.docs_en_quality)
    register_op("docs_join_embeddings")(steps.docs_join_embeddings)
    register_op("filter_unprocessed")(steps.filter_unprocessed)
    register_op("dedup_exact")(steps.dedup_exact)
    register_op("docs_slice")(steps.docs_slice)
    register_op("docs_sample_hash")(steps.docs_sample_hash)
    register_op("top_docs_per_lang")(steps.top_docs_per_lang)
    register_op("orders_custkey_hll", dependent=True)(steps.orders_custkey_hll)
    register_op("events_user_hll_hourly",
                dependent=True)(steps.events_user_hll_hourly)
    register_op("lineitem_orders_semijoin")(steps.lineitem_orders_semijoin)
    register_op("normalize_part_names")(steps.normalize_part_names)
    register_op("lineitem_agg")(steps.lineitem_agg)
    register_op("lineitem_rollup")(steps.lineitem_rollup)
    register_op("customer_order_counts")(steps.customer_order_counts)
    register_op("events_hourly")(steps.events_hourly)
    register_op("events_sessionize")(steps.events_sessionize)
    register_op("events_asof_orders")(steps.events_asof_orders)
    register_op("events_rolling_count")(steps.events_rolling_count)
    register_op("knn_embeddings")(steps.knn_embeddings)
    register_op("docs_text_features")(steps.docs_text_features)
    register_op("revenue_by_nation")(steps.revenue_by_nation)
    register_op("distinct_langs")(steps.distinct_langs)
    register_op("top_docs_by_length")(steps.top_docs_by_length)
    register_op("docs_sample_stratified")(steps.docs_sample_stratified)
    register_op("docs_lang_temperature_sample")(
        steps.docs_lang_temperature_sample)
    register_op("docs_nchars_quantiles")(steps.docs_nchars_quantiles)
    register_op("docs_lang_quantiles")(steps.docs_lang_quantiles)
    register_op("docs_nchars_quantiles_sampled")(
        steps.docs_nchars_quantiles_sampled)
    register_op("top_terms")(steps.top_terms)
    register_op("docs_pack_shards")(steps.docs_pack_shards)
    register_op("docs_repetition_stats")(steps.docs_repetition_stats)
    register_op("docs_sample_weighted")(steps.docs_sample_weighted)
    register_op("docs_domain_stats")(steps.docs_domain_stats)
    register_op("docs_domain_filter")(steps.docs_domain_filter)
    register_op("docs_rank_by_length")(steps.docs_rank_by_length)
    register_op("docs_quality_buckets")(steps.docs_quality_buckets)
    register_op("docs_chunk_windows")(steps.docs_chunk_windows)
    register_op("docs_lm_score", dependent=True)(steps.docs_lm_score)
    register_op("docs_bloom_seen", dependent=True)(steps.docs_bloom_seen)
    register_op("term_postings")(steps.term_postings)
    register_op("docs_split_assign")(steps.docs_split_assign)
    register_op("docs_nb_quality", dependent=True)(steps.docs_nb_quality)

    from . import extras

    register_op("flagship_extract")(extras._flagship)
    register_op("flagship_titles")(extras._flagship_titles)
    register_op("jats_extract_text")(extras._jats_extract_text)
    register_op("pdf_extract_text")(extras._pdf_extract_text)
    register_op("extract_jats_pages")(extras._extract_jats)
    # round-2 version bumps: output schema/semantics changed (hex/json
    # serialization, planted text, exhaustive-probe knn, rounded
    # langid) — a new version dir prevents a round-1 cache from being
    # served as current by the skip-unless-overwrite rule
    register_op("docs_langid_quality", version="2.0.0")(extras._docs_langid_quality)
    register_op("docs_fingerprint")(extras._docs_fingerprint)
    register_op("docs_token_count")(extras._docs_token_count)
    register_op("docs_char_entropy")(extras._docs_char_entropy)
    register_op("docs_compression_ratio")(extras._docs_compression_ratio)
    register_op("abbrev_expand")(extras._abbrev_expand)
    register_op("minhash_dedup_groups")(extras._minhash_groups)
    register_op("minhash_dedup_incremental")(extras._minhash_dedup_incremental)
    register_op("simhash_dedup_groups")(extras._simhash_groups)
    register_op("simhash_dedup_incremental")(extras._simhash_dedup_incremental)
    register_op("docs_decontaminate")(extras._docs_decontaminate)
    register_op("docs_line_dedup")(extras._docs_line_dedup)
    register_op("docs_dup_spans")(extras._docs_dup_spans)
    register_op("docs_pii_redact")(extras._docs_pii_redact)
    register_op("top_terms_cms")(extras._docs_top_terms_cms)
    register_op("docs_url_filter")(extras._docs_url_filter)
    register_op("docs_outlinks")(extras._docs_outlinks)
    register_op("host_indegree")(extras._host_indegree)
    register_op("host_components")(extras._host_components)
    register_op("host_anchor_topk", dependent=True)(extras._host_anchor_topk)
    register_op("docs_normalize_text")(extras._docs_normalize_text)
    register_op("docs_training_mix")(extras._docs_training_mix)
    register_op("ngram_jaccard_dups")(extras._ngram_jaccard_dups)
    register_op("embedding_cosine_dups")(extras._embedding_cosine_dups)
    register_op("embed_documents", version="2.0.0")(extras._embed_documents)
    register_op("llm_demographics", version="2.0.0")(extras._llm_demographics)
    register_op("llm_task_metadata", version="1.1.0")(extras._llm_task_metadata)
    register_op("abbrev_expand_planted")(extras._abbrev_expand_planted)
    register_op("entity_linking", version="2.0.0")(extras._entity_linking)
    register_op("umls_disease_groups")(extras._umls_disease_groups)
    register_op("entity_linking_chained",
                input_pipelines=["llm_demographics"])(extras._entity_linking_chained)
    register_op("knn_ivf", version="2.0.0")(extras._knn_ivf)
    register_op("knn_lsh")(extras._knn_lsh)
    register_op("embeddings_kmeans")(extras._embeddings_kmeans)
    register_op("embeddings_semdedup")(extras._embeddings_semdedup)
    register_op("docs_url_canonicalize")(extras._docs_url_canonicalize)
    register_op("multimodal_features", version="2.0.0")(extras._multimodal_features)

    def _evaluation_golden_metrics_op(sf_dir: str):
        # sf_dir unused by design: the op replays COMMITTED golden
        # outputs (root via NSE_GOLDEN_RESULTS_ROOT), not corpus data.
        # One shared implementation with __ray_entry__ — rounding and
        # path resolution live inside golden_replay_metrics.
        from ..pipelines.evaluation import golden_replay_metrics

        return golden_replay_metrics()

    register_op("evaluation_golden_metrics")(_evaluation_golden_metrics_op)
    register_op("docs_domain_cap")(steps.docs_domain_cap)
    register_op("docs_outlinks_anchored")(extras._docs_outlinks_anchored)
    register_op("warc_source_roundtrip")(extras._warc_source_roundtrip)
    register_op("warc_extract_text")(extras._warc_extract_text)
    register_op("docs_robots_filter")(extras._docs_robots_filter)
    register_op("host_pagerank", dependent=True)(extras._host_pagerank)
    register_op("docs_gopher_rules")(steps.docs_gopher_rules)
    register_op("docs_c4_rules")(extras._docs_c4_rules)
    register_op("docs_pack_sequences")(steps.docs_pack_sequences)
    register_op("docs_bpe_merges")(steps.docs_bpe_merges)
    register_op("docs_bpe_encode")(steps.docs_bpe_encode)
    register_op("docs_importance_weights")(steps.docs_importance_weights)
    register_op("docs_importance_weights_hashed")(
        steps.docs_importance_weights_hashed)
    register_op("docs_winnow_fingerprints")(steps.docs_winnow_fingerprints)
    register_op("corpus_stats")(steps.corpus_stats)
    register_op("embeddings_label_centroids")(
        steps.embeddings_label_centroids)
    register_op("events_hourly_top")(steps.events_hourly_top)
    register_op("events_user_retention")(steps.events_user_retention)
    register_op("docs_boilerplate_strip")(steps.docs_boilerplate_strip)
    register_op("docs_diff_planted")(steps.docs_diff_planted)
    register_op("docs_bm25")(steps.docs_bm25)
    register_op("docs_domain_percentile_filter")(
        steps.docs_domain_percentile_filter)

    # Reference pipeline-name aliases (snake-cased extractor class
    # names a reference user types at the CLI, cli/run.py:13-33):
    # ParticipantDemographicsExtractor 1.1.0, TaskExtractor 1.1.0,
    # GeneralAPIEmbeddingExtractor 1.0.0, UMLSDiseaseExtractor,
    # TFIDFExtractor, WordCountExtractor map onto the engine ops.
    register_op("participant_demographics", version="1.1.0")(extras._llm_demographics)
    register_op("task", version="1.1.0")(extras._llm_task_metadata)
    register_op("general_api_embedding", version="1.0.0")(extras._embed_documents)
    register_op("semantic_embeddings", version="1.0.0")(extras._embed_documents)
    register_op("umls_disease", version="1.0.0")(extras._umls_disease_groups)


_register_builtins()
