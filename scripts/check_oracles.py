"""Local mimic of the driver's correctness gate: run every queries() entry and
its oracle_sql() counterpart side by side, compare row count, column names and
order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data
        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame,
            float_atol: float = 1e-9) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    rc, sc = sorted(map(str, ray_df.columns)), sorted(map(str, sql_df.columns))
    if rc != sc:
        problems.append(f"columns ray={rc} sql={sc}")
        return problems
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
                av = pd.to_numeric(av, errors="coerce")
                bv = pd.to_numeric(bv, errors="coerce")
                bad = ~((av.isna() & bv.isna())
                        | (abs(av - bv) <= float_atol))
            else:
                avs = av.map(lambda v: "" if v is None or (isinstance(v, float) and math.isnan(v)) else str(v))
                bvs = bv.map(lambda v: "" if v is None or (isinstance(v, float) and math.isnan(v)) else str(v))
                bad = avs != bvs
            n_bad = int(bad.sum())
            if n_bad:
                i = bad.idxmax()
                problems.append(f"col {c}: {n_bad} mismatches, first ray={a[c][i]!r} sql={b[c][i]!r}")
    return problems


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    from amharic_ecommerce_data_extractor_ray.np_oracles import (
        numpy_oracles)
    np_oracles = numpy_oracles()
    n_ok = n_fail = 0
    report: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            report[name] = {"status": "fail", "oracle": name in sqls,
                            "problems": [f"query raised {type(e).__name__}: {e}"]}
            n_fail += 1
            continue
        if name not in sqls:
            # non-SQL-expressible queries: value-compare against the
            # committed single-process numpy oracle (VERDICT r4 #4) —
            # wider float atol because both sides round to 1e-6 but fold
            # sums in different orders (see np_oracles module docstring)
            if name in np_oracles:
                expected = np_oracles[name](sf_dir)
                problems = compare(name, ray_df, expected, float_atol=2e-6)
                if problems:
                    print(f"FAIL {name} (numpy oracle): "
                          + "; ".join(problems))
                    report[name] = {"status": "fail", "rows": len(ray_df),
                                    "oracle": "numpy",
                                    "problems": problems}
                    n_fail += 1
                else:
                    print(f"OK   {name}: rows={len(ray_df)} (numpy oracle)")
                    report[name] = {"status": "ok", "rows": len(ray_df),
                                    "oracle": "numpy"}
                    n_ok += 1
                continue
            print(f"ok   {name}: rows={len(ray_df)} (no oracle — rows-only)")
            report[name] = {"status": "ok", "rows": len(ray_df),
                            "oracle": False}
            n_ok += 1
            continue
        try:
            sql_df = con.execute(sqls[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            report[name] = {"status": "fail", "oracle": True,
                            "problems": [f"oracle raised {type(e).__name__}: {e}"]}
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            report[name] = {"status": "fail", "rows": len(ray_df),
                            "oracle": True, "problems": problems}
            n_fail += 1
        else:
            print(f"OK   {name}: rows={len(ray_df)}")
            report[name] = {"status": "ok", "rows": len(ray_df),
                            "oracle": True}
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} failed")
    if json_out:
        import json as _json
        with open(json_out, "w") as f:
            _json.dump({"sf_dir": sf_dir, "n_ok": n_ok, "n_fail": n_fail,
                        "queries": report}, f, indent=1, sort_keys=True)
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
