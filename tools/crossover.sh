#!/bin/bash
# Floor-resident crossover duel: both engines on the SAME 1x/10x/100x
# replicated-documents corpora (the ScaleBench cache), one committed
# artifact (CROSSOVER_r$R.json) recording per-query Spark/DuckDB times
# and ratios per factor — the reproducible form of round 13's "the weak
# set is a measurement-scale property" evidence (ARCHITECTURE.md "The
# crossover, measured"), promoted from transcribed spark-shell medians
# exactly as trisf.sh promoted the tri-SF gate.
#
# Protocol (round-13 duel, unchanged): Spark = median of 4 reps after a
# dropped warmup at local[32] (graft.Crossover); DuckDB = min of 5 on
# the per-factor oracle SQL the Spark side dumps, with the documents
# view swapped to the scaled parquet and every other table from the
# base SF dir. q107's support threshold scales with the factor on BOTH
# sides (see Relational.q107SqlWith). Both halves run serially in one
# invocation on an otherwise idle machine.
#
# Usage: tools/crossover.sh [round]      # e.g. tools/crossover.sh 14
# Output: CROSSOVER_r$R.json in the repo root + logs under
# /tmp/crossover_r$R. Idempotent per round dir: the Spark half is
# skipped when its json exists — wipe /tmp/crossover_r$R to re-run at
# a new HEAD within the same round.
#
# NOTE: measurement — don't run while a pairing/bench sweep is live.
set -e
cd /root/repo
R=${1:-14}
OUT=/tmp/crossover_r$R
DATA=${GRAFT_TESTDATA:-/root/testdata}
mkdir -p $OUT
if [ -f $OUT/spark_crossover.json ]; then
  echo "=== spark half: already done"
else
  echo "=== spark half $(date +%T)"
  SPARK_GRAFT_SF_DIR=$DATA/sf0.1 \
    sbt -batch "runMain graft.Crossover $OUT 1 10 100" \
    > $OUT/spark.log 2>&1
  grep '^\[crossover\]' $OUT/spark.log
fi
echo "=== duckdb half $(date +%T)"
python3 - "$R" "$OUT" "$DATA/sf0.1" <<'EOF'
import json, os, subprocess, sys, time
import duckdb

r, out, base = sys.argv[1], sys.argv[2], sys.argv[3]
sp = json.load(open(f"{out}/spark_crossover.json"))
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
DUCK_RUNS = 5
duck = {}
for f in sp["factors"]:
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    corpus = sp["corpora"][f"x{f}"]
    for t in TABLES:
        # any table the scaled corpus dir contains overrides the base SF
        # dir (documents + lineitem today) — exactly the table set the
        # Spark half read from the same dir; everything else resolves
        # from base so any helper view stays defined
        p = f"{corpus}/{t}.parquet"
        if not os.path.exists(p):
            p = f"{base}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                if os.path.isdir(p) else
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for name in sp["cohort"]:
        sql = sp["sql"][name][f"x{f}"]
        best = None
        for _ in range(DUCK_RUNS):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best or 1e99, time.time() - t0)
        duck.setdefault(name, {})[f"x{f}"] = round(best, 3)
        print(f"[duck] x{f} {name} min-of-{DUCK_RUNS}={best:.3f}")
    con.close()

queries = {}
for name in sp["cohort"]:
    row = {}
    for f in sp["factors"]:
        s = sp["spark"][name][f"x{f}"]["median"]
        d = duck[name][f"x{f}"]
        row[f"x{f}"] = {"spark_sec": s, "duck_sec": d,
                        "ratio": round(s / d, 3) if d > 0 else None}
    queries[name] = row

load = open("/proc/loadavg").read().split()[0]
art = {
    "round": int(r) if r.isdigit() else r,
    "head": subprocess.check_output(
        ["git", "rev-parse", "--short", "HEAD"]).decode().strip(),
    "base": sp["base"],
    "factors": sp["factors"],
    "protocol": dict(sp["protocol"],
                     duck=f"min of {DUCK_RUNS} on the identical per-factor "
                          "oracle SQL, corpus-dir tables (documents, "
                          "lineitem) swapped to the scaled parquet, "
                          "threads=%d" % os.cpu_count()),
    "env": dict(sp["env"], load_end_duck=float(load)),
    "queries": queries,
}
with open(f"CROSSOVER_r{r}.json", "w") as fh:
    json.dump(art, fh, indent=1)
print(f"wrote CROSSOVER_r{r}.json")
for name, row in queries.items():
    print(" ", name,
          " ".join(f"x{f}={row[f'x{f}']['ratio']}x" for f in sp["factors"]))
EOF
