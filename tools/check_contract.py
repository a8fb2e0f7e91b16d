"""Local stand-in for the driver's correctness harness: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at sf0.01,
compare row-count + column names + order-insensitive value hash."""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01", only: str = "") -> int:
    import __spark_entry__ as entrymod
    from import_spark.session import get_spark

    spark = get_spark("contract-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    if only:
        names = set(only.split(","))
        qs = {n: f for n, f in qs.items() if n in names}
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} SPARK ERROR: {e}")
            failures += 1
            continue
        if name not in osql:
            print(f"{name:24s} rows={len(sdf):8d}  (rows-only, no oracle)")
            continue
        try:
            ddf = con.execute(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} DUCKDB ERROR: {e}")
            failures += 1
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(ddf)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        if status != "OK":
            failures += 1
            print(
                f"{name:24s} {status} rows {len(sdf)}/{len(ddf)} cols "
                f"{sorted(sdf.columns)} vs {sorted(ddf.columns)}"
            )
            if ok_rows and ok_cols:
                merged = sdf.merge(ddf, how="outer", indicator=True)
                print(merged[merged["_merge"] != "both"].head(6).to_string())
        else:
            print(f"{name:24s} OK rows={len(sdf)}")
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
