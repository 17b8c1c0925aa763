"""Local mimic of the driver's CORRECTNESS gate: run every queries() entry
on Spark at sf0.01 and its oracle_sql() on DuckDB over the same parquet
views; compare row count, column-name set, and a value hash computed over
columns sorted by name."""
import os
import sys, json, hashlib, math
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def value_hash(rows, cols):
    cols = sorted(cols)
    lines = sorted("|".join(norm(r[c]) for c in cols) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    import __spark_entry__ as em

    qs, osql = em.queries(), em.oracle_sql()
    only = sys.argv[1:] or list(qs)
    results = {}
    for name in only:
        try:
            sdf = qs[name](spark, SF)
            srows = [r.asDict(recursive=True) for r in sdf.collect()]
            scols = sdf.columns
            if name not in osql:
                results[name] = {"spark_rows": len(srows), "err": "no_oracle"}
                continue
            cur = con.execute(osql[name])
            ocols = [d[0] for d in cur.description]
            orows = [dict(zip(ocols, r)) for r in cur.fetchall()]
            res = {
                "rows_match": len(srows) == len(orows),
                "schema_match": sorted(scols) == sorted(ocols),
                "hash_match": None,
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
                "err": None,
            }
            if res["rows_match"] and res["schema_match"]:
                res["hash_match"] = value_hash(srows, scols) == value_hash(orows, ocols)
            results[name] = res
        except Exception as e:
            results[name] = {"err": f"{type(e).__name__}: {str(e)[:200]}"}
        r = results[name]
        ok = r.get("hash_match")
        print(f"{'PASS' if ok else 'FAIL' if ok is False else 'ERR '} {name}: {json.dumps(r, default=str)}", flush=True)
    bad = [n for n, r in results.items() if r.get("hash_match") is not True]
    print("\nSUMMARY:", len(results) - len(bad), "green /", len(results), "— failing:", bad)


if __name__ == "__main__":
    main()
