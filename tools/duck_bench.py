#!/usr/bin/env python3
"""DuckDB timing twin of graft.Bench (NOT shipped code).

Times every oracle SQL from a graft.Verify dump against the same
parquet tables DuckDB-side, printing one JSON line in the same shape as
BENCH_r*.json so the Spark/DuckDB ratio is a reproducible measurement
instead of an inference. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01"
    python3 tools/duck_bench.py /root/testdata/sf0.1 /tmp/verify_sf01
"""
import sys, json, os, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        t0 = time.time()
        con.execute(oracle[name]).fetchall()
        results[name] = round(time.time() - t0, 3)
    load = open("/proc/loadavg").read().split()[0]
    print(json.dumps({
        "metric": "duckdb_total", "value": round(sum(results.values()), 3),
        "unit": "sec", "queries": results, "sf": sf_dir,
        "env": {"cpus": os.cpu_count(), "load_end": float(load)}}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
