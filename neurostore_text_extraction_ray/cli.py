"""CLI veneer (SURVEY S8; reference ``ns_extract/cli/run.py:141-216``):

    python -m neurostore_text_extraction_ray.cli \
        --sf-dir /root/testdata/sf0.001 --out /tmp/out \
        [--pipelines word_count tfidf | --config cfg.yaml] \
        [--num-cpus N] [--flagship]

Owns the Ray session (scripts init + shutdown; library code never
does)."""

from __future__ import annotations

import argparse
import json
import sys
import tempfile


def main(argv=None):
    ap = argparse.ArgumentParser(prog="nse-ray")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    ap.add_argument("--pipelines", nargs="*", default=None)
    ap.add_argument("--config", default=None)
    # --num-workers is the reference's flag name (cli/run.py:149-154);
    # both map to the Ray session's CPU budget here
    ap.add_argument("--num-cpus", "--num-workers", dest="num_cpus",
                    type=int, default=8)
    ap.add_argument("--flagship", action="store_true",
                    help="run the flagship extraction to a resumable sink")
    ap.add_argument("--incremental", action="store_true",
                    help="flagship: per-url change detection — stable run "
                         "dir, only changed urls re-extract (dirty parts "
                         "merge, clean parts untouched)")
    ap.add_argument("--list", action="store_true", help="list registered operators")
    # post-processing control (reference cli/run.py:156-176)
    ap.set_defaults(post_process=True)
    pp = ap.add_mutually_exclusive_group()
    pp.add_argument("--no-post-process", action="store_false", dest="post_process",
                    help="disable post-processing of results")
    pp.add_argument("--post-process-only", action="store_const", const="only",
                    dest="post_process",
                    help="only post-process existing results")
    ap.add_argument("--overwrite", action="store_true",
                    help="overwrite existing results")
    args = ap.parse_args(argv)

    from .pipelines import registry

    if args.list:
        for name, version in registry.list_ops().items():
            print(f"{name}\t{version}")
        return 0

    if args.pipelines:
        unknown = [n for n in args.pipelines if n not in registry.list_ops()]
        if unknown:
            ap.error(
                f"unknown pipeline(s): {', '.join(unknown)} "
                f"(see --list for registered operators)"
            )

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    out_dir = args.out or tempfile.mkdtemp(prefix="nse_ray_out_")
    try:
        if args.flagship:
            from .pipelines import flagship
            from .sources import pages as pages_src

            run_dir, summary = flagship.run_flagship_to_parquet(
                pages_src.read_pages(args.sf_dir), out_dir,
                input_path=f"{args.sf_dir}/documents.parquet",
                incremental=args.incremental,
            )
            print(json.dumps({
                "run_dir": run_dir,
                "parts": len(summary),
                "rows": int(summary["rows"].sum()) if len(summary) else 0,
                "extracted": int(summary["n_extracted"].sum()) if len(summary) else 0,
                "reused": int(summary["n_reused"].sum()) if len(summary) else 0,
            }))
        if args.config:
            results = registry.run_config(
                args.config, args.sf_dir, out_dir,
                post_process=args.post_process, overwrite=args.overwrite,
            )
            print(json.dumps(results))
        elif args.pipelines:
            results = registry.run_entries(
                [(name, {}) for name in args.pipelines], args.sf_dir, out_dir,
                post_process=args.post_process, overwrite=args.overwrite,
            )
            print(json.dumps(results))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
