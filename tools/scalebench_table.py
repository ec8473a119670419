#!/usr/bin/env python3
"""Refresh ARCHITECTURE.md's measured-scaling tables from a ScaleBench
double-sweep log (the r12 protocol: two full 1x/10x/100x passes in one
JVM, per-row min-of-2) — so the table of record is regenerated from the
committed SCALEBENCH_r{N}.log instead of hand-transcribed.

Usage: python3 tools/scalebench_table.py SCALEBENCH_r14.log [--apply]
Prints per-op min-of-2 rows; with --apply, rewrites the numeric cells
of the main scaling table AND the zipf-axis table in ARCHITECTURE.md
in place (row labels and shape prose are left alone, except the
forced-Pregel numbers embedded in shape text).
"""
import json, os, re, sys


def fmt(v):
    return (f"{v:.2f}s" if v < 1 else f"{v:.1f}s")


# ARCHITECTURE table row label (prefix) -> ScaleBench json key
MAIN = [
    ("vocabulary + df", "vocab_df"),
    ("exact dedup", "exact_dedup"),
    ("quality rules", "quality_rules"),
    ("simhash", "simhash"),
    ("LSH near-dup PAIRS", "lsh_pairs"),
    ("LSH canonicalize", "canonicalize"),
    ("decontaminate", "decontaminate"),
    ("POS lexicon tagging", "pos_lexicon"),
    ("POS HMM tagging", "pos_hmm"),
    ("HLL distinct", "hll_distinct"),
    ("count-min build+probe", "countmin"),
    ("bloom census", "bloom_census"),
    ("quantile sketch", "quantile_sketch"),
    ("as-of join", "asof_join"),
    ("binned range join", "range_join"),
    ("heavy hitters", "heavy_hitters"),
    ("HLL register merge", "hll_merge"),
    ("weighted reservoir sample", "weighted_sample"),
    ("BM25 top-k", "bm25_topk"),
    ("kNN brute", "knn_brute"),
    ("kNN sign-LSH", "knn_lsh"),
    ("kNN IVF (KMeans", "knn_ivf"),
    ("kNN IVF deterministic", "knn_ivf_det"),
    ("PQ ADC kNN", "pq_adc_knn"),
    ("IVF+PQ kNN", "knn_ivfpq"),
    ("IVF+PQ persisted index", ("ivfpq_index_build", "ivfpq_index_query")),
    ("fuzzy Hamming join", "fuzzy_hamming"),
    ("set-similarity join", "setsim_join"),
    ("frequent token pairs", "frequent_pairs"),
    ("multi-source BFS", "bfs_levels"),
    ("exact substring-dup coverage", "substring_dup"),
    ("cross-source overlap matrix", "source_overlap"),
    ("DSIR importance resample", "dsir_resample"),
    ("perplexity-bucket mixing", "ppl_buckets"),
    ("SemDeDup keep-list", "semdedup"),
    ("connected components", "connected_components"),
    ("PageRank", "pagerank"),
    ("triangle counting", "triangles"),
    ("SCD2 run assembly", "scd2_runs"),
    ("point-in-time features", "pit_features"),
    ("session path mining", "session_paths"),
    ("cumulative distinct growth", "distinct_growth"),
    ("2-D skyline", "skyline"),
    ("centroid cosine matrix", "centroid_sim"),
    ("nearest-in-time join", "nearest_join"),
    ("DAU / trailing-WAU", "active_users"),
    ("HLL growth curve", "hll_growth"),
]
ZIPF = [
    ("zipf_df_census", "zipf_df_census"),
    ("ctrl_df_census", "ctrl_df_census"),
    ("zipf_bm25", "zipf_bm25"),
    ("zipf_frequent_pairs", "zipf_frequent_pairs"),
]
# forced-Pregel numbers live inside the shape prose of these rows
PREGEL = {
    "multi-source BFS": "bfs_pregel",
    "connected components": "cc_pregel",
    "PageRank": "pagerank_pregel",
    "triangle counting": "triangles_pregel",
}
FACTORS = (1, 10, 100)


def parse(log_path):
    rows = {}
    for line in open(log_path, errors="replace"):
        line = line.strip()
        if line.startswith('{"factor"'):
            d = json.loads(line)
            rows.setdefault(d["factor"], []).append(d)
    best = {}
    for f, passes in rows.items():
        merged = {}
        for p in passes:
            for k, v in p.items():
                if isinstance(v, (int, float)) and k not in ("factor", "rows"):
                    merged[k] = min(merged.get(k, v), v)
        best[f] = merged
    missing = [f for f in FACTORS if f not in best]
    if missing:
        sys.exit(f"log has no rows for factors {missing}")
    n_passes = {f: len(p) for f, p in rows.items()}
    return best, n_passes


def have(best, key, f):
    """True when every json key behind a table cell exists at factor f.
    A sweep where one op crashed or was filtered out at one factor must
    degrade to a per-cell WARN + em-dash, not a KeyError aborting the
    whole render (and --apply) — the same per-row policy the unmatched-
    label WARNs already follow."""
    keys = key if isinstance(key, tuple) else (key,)
    missing = [k for k in keys if k not in best.get(f, {})]
    for k in missing:
        print(f"WARN: missing {k} at x{f}", file=sys.stderr)
    return not missing


def cell(best, key, f):
    if not have(best, key, f):
        return "—"
    if isinstance(key, tuple):
        return "/".join(f"{best[f][k]:.1f}" for k in key) + "s"
    return fmt(best[f][key])


def main(argv):
    log_path = argv[0]
    apply_ = len(argv) > 1 and argv[1] == "--apply"
    best, n_passes = parse(log_path)
    print(f"# passes per factor: {n_passes}")
    for label, key in MAIN + ZIPF:
        print(f"{label}: " + " ".join(cell(best, key, f) for f in FACTORS))
    if not apply_:
        return
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arch = os.path.join(root, "ARCHITECTURE.md")
    full = open(arch).read()
    # scope substitutions to their own sections — several scaling-table
    # labels ("HLL distinct", "fuzzy Hamming join") prefix rows of the
    # UNRELATED shuffle-inventory table earlier in the file
    main_at = full.index("## Measured scaling")
    zipf_at = full.index("### Zipf-token axis")
    assert zipf_at < main_at
    head, zipf_sec, text = full[:zipf_at], full[zipf_at:main_at], full[main_at:]
    for label, key in MAIN:
        esc = re.escape(label)
        pat = re.compile(
            rf"^(\| {esc}[^|]*\| )[^|]+\| [^|]+\| [^|]+(\|.*)$", re.M)
        c1, c10, c100 = (cell(best, key, f) for f in FACTORS)
        new, n = pat.subn(
            lambda m: f"{m.group(1)}{c1} | {c10} | {c100} {m.group(2)}",
            text, count=1)
        if n != 1:
            print(f"WARN: main row not found: {label}")
        else:
            text = new
    for label, key in PREGEL.items():
        if not all(have(best, key, f) for f in FACTORS):
            print(f"WARN: pregel row skipped (missing data): {label}")
            continue
        esc = re.escape(label)
        pk = "/".join(fmt(best[f][key]).rstrip("s") for f in FACTORS) + "s"
        pat = re.compile(
            rf"^(\| {esc}.*forced-Pregel(?: row)?: )[\d./]+s(.*)$", re.M)
        new, n = pat.subn(lambda m: m.group(1) + pk + m.group(2), text, count=1)
        if n != 1:
            print(f"WARN: pregel prose not found: {label}")
        else:
            text = new
    # zipf table rows: | zipf_df_census (q88 inverted index) | a | b | c | growth |
    for label, key in ZIPF:
        if not all(have(best, key, f) for f in FACTORS):
            print(f"WARN: zipf row skipped (missing data): {label}")
            continue
        esc = re.escape(label)
        g = best[100][key] / best[10][key]
        growth = f"{g:.1f}×"
        pat = re.compile(rf"^(\| {esc}[^|]*\| )[^|]+\| [^|]+\| [^|]+\| [^|]+\|$",
                         re.M)
        c1, c10, c100 = (fmt(best[f][key]).replace("s", " s") for f in FACTORS)
        suffix = {"zipf_df_census": " — linear" if g < 12 else " — SUPER-linear",
                  }.get(key, "")
        new, n = pat.subn(
            lambda m: f"{m.group(1)}{c1} | {c10} | {c100} | {growth}{suffix} |",
            zipf_sec, count=1)
        if n != 1:
            print(f"WARN: zipf row not found: {label}")
        else:
            zipf_sec = new
    open(arch, "w").write(head + zipf_sec + text)
    print("applied to ARCHITECTURE.md")


if __name__ == "__main__":
    main(sys.argv[1:])
