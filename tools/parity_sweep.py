"""Standalone full-surface parity sweep: run EVERY ``queries()`` entry
and its ``oracle_sql()`` side by side at an arbitrary scale factor
(default sf0.01 — the driver's CORRECTNESS gate scale, one step above
the sf0.001 the pytest replica uses) and report per-query row-count /
schema / value agreement with the same canonicalization the driver
applies (columns sorted by name, rows sorted by all columns).

Usage:  python tools/parity_sweep.py [--sf /root/testdata/sf0.01] [names...]

Owns a Ray session (repo rule: only bench.py, cli.py, the test fixture
and the standalone runners call ray.init) — do NOT run concurrently
with a bench or the scale-evidence runner (one cluster at a time).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _oracle(sql: str, sf: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = con.execute(sql).fetchdf()
    con.close()
    return df


def _canon(df):
    import pandas as pd  # noqa: F401

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _compare(name: str, mine, gold) -> str | None:
    import pandas as pd

    if list(mine.columns) != list(gold.columns):
        return f"schema {list(mine.columns)} vs {list(gold.columns)}"
    if len(mine) != len(gold):
        return f"rows {len(mine)} vs {len(gold)}"
    for c in mine.columns:
        mf = pd.api.types.is_float_dtype(mine[c])
        gf = pd.api.types.is_float_dtype(gold[c])
        if mf != gf and not (mine[c].isna().any() or gold[c].isna().any()):
            return f"{c}: dtype split {mine[c].dtype} vs {gold[c].dtype}"
        if mf or gf:
            a = mine[c].astype(float).to_numpy()
            b = gold[c].astype(float).to_numpy()
            import numpy as np

            bad = ~(np.isclose(a, b, rtol=0, atol=1e-9)
                    | (np.isnan(a) & np.isnan(b)))
            if bad.any():
                i = int(np.argmax(bad))
                return f"{c}: value {a[i]!r} vs {b[i]!r} at row {i}"
        else:
            neq = mine[c].to_numpy() != gold[c].to_numpy()
            if neq.any():
                import numpy as np

                i = int(np.argmax(neq))
                return (f"{c}: value {mine[c].iloc[i]!r} vs "
                        f"{gold[c].iloc[i]!r} at row {i}")
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
            log_to_driver=False)
    try:
        import __ray_entry__ as e

        qs = e.queries()
        sqls = e.oracle_sql()
        names = args.names or list(qs)
        failed = {}
        for i, name in enumerate(names):
            t0 = time.monotonic()
            try:
                res = qs[name](args.sf)
                mine = _canon(res if not hasattr(res, "to_pandas")
                              else res.to_pandas())
                sql = sqls.get(name)
                if sql is None:
                    failed[name] = "no oracle"
                    continue
                gold = _canon(_oracle(sql, args.sf))
                err = _compare(name, mine, gold)
            except Exception as exc:  # noqa: BLE001
                err = f"EXC {type(exc).__name__}: {exc}"
            dt = time.monotonic() - t0
            status = "ok" if err is None else "FAIL"
            print(f"[{i + 1}/{len(names)}] {name}: {status} ({dt:.1f}s)"
                  + (f" — {err}" if err else ""), flush=True)
            if err:
                failed[name] = err
        print(json.dumps({"sf": args.sf, "n": len(names),
                          "failed": failed}))
        return 1 if failed else 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
