"""Hash-exact oracle gate: the driver's CORRECTNESS pass sorts columns by
name, stringifies every cell, and hashes — NO float tolerance. The local
parity harness (tests/oracle_harness.compare) tolerates float noise, so a
query can pass parity and still land a red hash row (round-4 postmortem:
decimal trailing zeros, half-cent ROUND divergence). This script replays
the exact-compare locally.

Usage::

    python /root/repo/tools/strict_oracle_check.py            # window (first 50)
    python /root/repo/tools/strict_oracle_check.py --all      # every oracle query
    python /root/repo/tools/strict_oracle_check.py q1 q2 ...  # specific queries

Exit 0 = every checked query is cell-for-cell string-identical to its
DuckDB oracle at sf0.01.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import __spark_entry__ as entry  # noqa: E402
from oracle_harness import duckdb_conn  # noqa: E402

from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str)
    if s.empty:
        # apply(axis=1) on an empty frame returns a DataFrame, not a
        # Series — sort_values would then need `by` and crash; an empty
        # frame is already canonical
        return s.reset_index(drop=True)
    key = s.apply(lambda r: "\x00".join(r.values), axis=1)
    return s.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)


def main() -> int:
    Q = entry.queries()
    O = entry.oracle_sql()
    args = sys.argv[1:]
    if args and args[0] == "--all":
        names = [n for n in Q if n in O]
    elif args:
        names = args
    else:
        names = [n for n in list(Q)[:50] if n in O]

    spark = get_spark(app_name="strict-check", master="local[8]")
    con = duckdb_conn(SF)
    ok_all = True
    for n in names:
        sp = Q[n](spark, SF).toPandas()
        orc = con.execute(O[n]).df()
        a, b = canon(sp), canon(orc)
        same_cols = list(a.columns) == list(b.columns)
        same_rows = len(a) == len(b)
        exact = same_cols and same_rows and a.equals(b)
        print(n, "cols", same_cols, "rows", same_rows, len(a), "EXACT", exact, flush=True)
        if not exact:
            ok_all = False
            if same_cols and same_rows:
                for c in a.columns:
                    neq = a[c] != b[c]
                    if neq.any():
                        i = neq.idxmax()
                        print(
                            f"  first diff col {c} row {i}: spark={a[c][i]!r} "
                            f"oracle={b[c][i]!r} ({int(neq.sum())} cells)"
                        )
    print("ALL_EXACT", ok_all)
    spark.stop()
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
