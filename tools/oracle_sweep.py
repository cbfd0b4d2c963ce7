"""Driver-gate replica: the rows+schema+value-hash oracle compare for
catalog entries at an arbitrary scale directory (verify skill surface 4,
promoted out of /tmp heredocs at r18 so the standing receipt doesn't
depend on scratch files surviving between sessions).

Two standing modes:

  python tools/oracle_sweep.py            # all 148 entries (full sweep)
  python tools/oracle_sweep.py --window   # the declared driver window
                                          # (first 50 = _DRIVER_WINDOW_PRIORITY)

Optional: --sf-dir DIR (default /root/testdata/sf0.01), or explicit
entry names as positional args. Exits nonzero on any mismatch. The
compare is byte-faithful to the driver's gate: columns sorted by name,
rows sorted by every column, %.9g float rendering, and the NULL
sentinel (plain to_csv renders NULL and '' identically, hiding
NULL-vs-empty-string divergences — the r16 lesson).
"""
from __future__ import annotations

import hashlib
import os
import sys

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def vhash(df) -> str:
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.9g",
                  na_rep="\x00NULL\x00").encode()
    ).hexdigest()


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf = "/root/testdata/sf0.01"
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        # ADVICE r18: --sf-dir as the LAST argument used to raise an
        # unhandled IndexError — validate and print usage instead.
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            print("usage: oracle_sweep.py [--window] [--sf-dir DIR] "
                  "[entry ...]  (--sf-dir requires a directory value)",
                  file=sys.stderr)
            return 2
        sf = args[i + 1]
        del args[i:i + 2]
    window_only = "--window" in args
    if window_only:
        args.remove("--window")

    import __spark_entry__ as entrymod
    from monthly_report_etl_spark.catalog import _DRIVER_WINDOW_PRIORITY
    from monthly_report_etl_spark.session import get_spark

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    if args:
        names = args
    elif window_only:
        names = list(_DRIVER_WINDOW_PRIORITY)
        assert list(queries)[:50] == names, (
            "queries() front-50 does not match _DRIVER_WINDOW_PRIORITY — "
            "the driver would check a different cohort"
        )
    else:
        names = list(oracles)

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    bad = []
    for name in names:
        try:
            s = canon(queries[name](spark, sf).toPandas())
            o = canon(con.execute(oracles[name]).fetchdf())
            for c in s.columns:
                if c in o.columns and s[c].dtype != o[c].dtype:
                    try:
                        o[c] = o[c].astype(s[c].dtype)
                    except Exception as exc:
                        # ADVICE r18: a failed coercion is worth a line —
                        # the vhash compare below still decides pass/fail,
                        # but a silent pass here can mask WHY it failed.
                        print(f"  note: {name}.{c} dtype coercion "
                              f"{o[c].dtype} -> {s[c].dtype} failed: "
                              f"{type(exc).__name__}", flush=True)
            if not (len(s) == len(o) and list(s.columns) == list(o.columns)
                    and vhash(s) == vhash(o)):
                bad.append(name)
                print(f"BAD {name}: spark={len(s)} oracle={len(o)}",
                      flush=True)
        except Exception as exc:  # noqa: BLE001 - sweep must not die mid-list
            bad.append(name)
            print(f"ERROR {name}: {type(exc).__name__}: {str(exc)[:160]}",
                  flush=True)
    print(f"checked: {len(names)}")
    print("bad:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
