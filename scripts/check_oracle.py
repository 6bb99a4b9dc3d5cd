"""Oracle parity checker for specific queries at specific scale factors.

Mirrors tests/test_entry_contract.py (row count + columns + exact sorted
rows vs the DuckDB oracle) but runnable standalone on any sf dir:

  python scripts/check_oracle.py --sf /root/testdata/sf0.01 \
      --queries rules_score,repetition_stats
"""

from __future__ import annotations

import argparse
import datetime
import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from quality_filter.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _rows_sorted(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", default="all")
    ap.add_argument("--json-out", default="", help="append results to this JSON artifact")
    args = ap.parse_args()

    if args.queries == "all":
        names = list(entry_mod.oracle_sql())
    else:
        names = [n for n in args.queries.split(",") if n]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")
    spark = get_spark("qf_oracle_check")
    oracles = entry_mod.oracle_sql()
    queries = entry_mod.queries()
    failed = []
    results: dict[str, dict] = {}
    for name in names:
        sdf = queries[name](spark, args.sf)
        scols = [c.lower() for c in sdf.columns]
        srows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(oracles[name])
        dcols = [c.lower() for c in rel.columns]
        drows = rel.fetchall()
        ok = sorted(scols) == sorted(dcols) and len(srows) == len(drows)
        if ok:
            a = _rows_sorted(scols, srows)
            b = _rows_sorted(dcols, drows)
            mism = [(x, y) for x, y in zip(a, b) if x != y]
            ok = not mism
        results[name] = {"ok": bool(ok), "rows": len(srows)}
        print(f"{name}: {'OK' if ok else 'FAIL'} ({len(srows)} rows)", flush=True)
        if not ok:
            failed.append(name)
    spark.stop()
    if args.json_out:
        import json
        import subprocess

        path = Path(args.json_out)
        art = json.loads(path.read_text()) if path.exists() else {}
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=Path(__file__).resolve().parent.parent,
            capture_output=True, text=True,
        ).stdout.strip()
        sf_key = args.sf.rstrip("/").rsplit("sf", 1)[-1]
        art[sf_key] = {
            "sf_dir": args.sf,
            "tree_commit": commit,
            "check": "exact sorted-row equality vs DuckDB oracle "
                     "(strictly stronger than the driver's value hash)",
            "results": results,
        }
        path.write_text(json.dumps(art, indent=1, sort_keys=True) + "\n")
    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
