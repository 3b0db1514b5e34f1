#!/usr/bin/env python
"""Driver-style correctness dry-run: every queries() entry vs its
oracle_sql() on the sf0.01 testdata — row count, column-name set, and
an order/column-order-insensitive value hash, mirroring the round
driver's compare."""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def value_hash(rows, cols):
    cols = sorted(cols)
    lines = sorted(
        "|".join(repr(r[c]) for c in cols) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def norm(v):
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    import duckdb
    import importlib
    e = importlib.import_module("__spark_entry__")
    from vcf2parquet_spark.session import get_spark
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(cores=16, app_name="correctness_dryrun")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = e.queries(), e.oracle_sql()
    bad = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf)
            srows = [{c: norm(r[c]) for c in sdf.columns}
                     for r in sdf.collect()]
            scols = set(sdf.columns)
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            fetched = res.fetchall()
            orows = [{c: norm(v) for c, v in zip(ocols, row)}
                     for row in fetched]
            ok_rows = len(srows) == len(orows)
            ok_cols = scols == set(ocols)
            ok_hash = (ok_rows and ok_cols and
                       value_hash(srows, scols) == value_hash(orows, ocols))
            status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
            if status == "FAIL":
                bad.append(name)
            print(f"{status:4} {name}: spark={len(srows)} oracle={len(orows)}"
                  f" cols_match={ok_cols} hash={ok_hash}", flush=True)
        except Exception as ex:
            bad.append(name)
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)
    spark.stop()
    print(f"\n{len(qs) - len(bad)}/{len(qs)} green; failures: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
