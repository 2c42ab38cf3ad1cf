#!/usr/bin/env python
"""Local rehearsal of the driver's CORRECTNESS gate at its OWN scale factor
(sf0.01), over ALL registry queries — not just the 50-slot window.

The driver checks only the first 50 registered queries per round; with 136
registry queries a full re-confirmation takes ~3 rounds of rotation. This
script (r7 VERDICT item 9) runs the same shape of check locally each round
— row count + schema-width + pandas-dtype + order-insensitive canonical
value multiset vs the DuckDB oracle, and a rows-only canonicalization pass
for non-oracle queries (which ALSO exercises the driver's array-column
fragility: its _canon sorts every output column with pandas, so an
array-typed cell raises exactly like the r1 observer_replay failure) — and
writes a CORRECTNESS-shaped sidecar, CORRECTNESS_local.json, so rotation
is belt-and-suspenders rather than the only evidence.

Usage:
    python scripts/driver_rehearsal.py             # resume/skip recorded
    python scripts/driver_rehearsal.py --force     # re-run everything
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 ...  # other scale factor

Incremental: results are merged into the sidecar after EVERY query, so a
killed run resumes where it stopped.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SIDECAR = os.path.join(_REPO, "CORRECTNESS_local.json")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, int):
        return float(v) if not isinstance(v, bool) else v
    return str(v)


def _multiset(cols, rows):
    return sorted(
        (
            tuple(_canon(v) for _, v in sorted(zip(cols, row), key=lambda p: p[0]))
            for row in rows
        ),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def _driver_style_canon(pdf):
    """The driver's fragility, reproduced on purpose: sort the pandas frame
    by every column. Array cells raise TypeError here exactly as they do in
    the driver's rows-only check."""
    if len(pdf.columns):
        pdf.sort_values(by=list(pdf.columns), inplace=False)
    return len(pdf)


def main() -> None:
    force = "--force" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("--")]

    import duckdb

    import __spark_entry__ as entry_mod
    from fdi_flow_spark.core.session import get_spark

    spark = get_spark(app_name="fdi_flow_spark-driver-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    # Always merge into the existing sidecar (a --force or named re-run must
    # never clobber the other queries' records); --force only disables the
    # per-name skip below.
    results: dict = {}
    if os.path.exists(SIDECAR):
        try:
            with open(SIDECAR) as f:
                doc = json.load(f)
            if doc.get("sf_dir") == SF_DIR:
                results = doc.get("queries", {})
        except (OSError, ValueError):
            pass

    def _flush():
        with open(SIDECAR, "w") as f:
            json.dump(
                {"sf_dir": SF_DIR, "generated_unix": int(time.time()), "queries": results},
                f,
                indent=1,
            )

    names = only or list(queries)
    for i, name in enumerate(names):
        done = results.get(name, {})
        if not force and (done.get("hash_match") or done.get("err") == "no_oracle"):
            continue
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, SF_DIR)
            # toPandas exercises the driver's array-column fragility; the
            # value multiset comes from collect() — pandas would turn NULL
            # doubles into NaN and falsely diverge from DuckDB's None
            spandas = sdf.toPandas()
            rec["spark_rows"] = _driver_style_canon(spandas)
            if name not in oracles:
                rec["err"] = "no_oracle"
            else:
                srows = [tuple(r) for r in sdf.collect()]
                res = con.execute(oracles[name])
                duck_cols = [d[0] for d in res.description]
                duck_rows = res.fetchall()
                rec["oracle_rows"] = len(duck_rows)
                rec["rows_match"] = len(srows) == rec["oracle_rows"]
                rec["schema_match"] = sorted(sdf.columns) == sorted(duck_cols)
                ms = _multiset(list(sdf.columns), srows)
                md = _multiset(duck_cols, duck_rows)
                rec["hash_match"] = bool(rec["rows_match"] and rec["schema_match"] and ms == md)
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
        rec["sec"] = round(time.perf_counter() - t0, 2)
        results[name] = rec
        _flush()
        status = (
            "PASS"
            if rec["hash_match"]
            else ("rows-only" if rec["err"] == "no_oracle" else "FAIL")
        )
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({rec['sec']}s)", file=sys.stderr)

    n_oracle = sum(1 for r in results.values() if r.get("err") != "no_oracle")
    n_pass = sum(1 for r in results.values() if r.get("hash_match"))
    n_rows_only = sum(1 for r in results.values() if r.get("err") == "no_oracle")
    n_fail = n_oracle - n_pass
    print(
        json.dumps(
            {
                "rehearsal": "driver-exact",
                "sf_dir": SF_DIR,
                "oracle_pass": n_pass,
                "oracle_fail": n_fail,
                "rows_only_ok": n_rows_only,
                "total": len(results),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
