"""Generate PLANS.md: physical-plan evidence for the optimizer story
(pushdown, pruning, broadcast, partial aggregation, codegen,
window-group-limit) across representative driver queries.

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)

REPRESENTATIVE = {
    "p1_empty_filter": "filter pushdown reaches the parquet scan",
    "p3_w4_title_top1": "top-1 per group lowers to WindowGroupLimit "
    "(partial top-k before the shuffle)",
    "p10_j2_containment_join": "containment = broadcast equi-join + "
    "range filters; map-side partial count",
    "j3_scanline_incidence": "8-row scanline side broadcast; big side "
    "never shuffles",
    "a4_interval_union_stats": "interval union islands: one shuffle on "
    "keys, all window arithmetic codegen'd",
    "a6_margins_minmax": "margins reduce to partial-aggregated min/max",
    "dedup_minhash_bands": "explode -> map-side partial min-agg; "
    "hashing work happens before the single shuffle",
    "ann_cosine_topk": "brute-force cosine lowers to "
    "TakeOrderedAndProject (no global sort)",
    "pipeline_references": "the flagship extraction: one ArrowEvalPython/"
    "MapInArrow stage over the scan, zero shuffles after the input "
    "rebalance",
    "dedup_exact": "md5 projection in the scan stage; the one shuffle "
    "moves only (id, hash) and partial-aggregates map-side",
    "j1_interval_join": "grid-bucketed range join as a SHUFFLED HASH "
    "join (no sort of the exploded sides, no nested loop) with "
    "canonical-cell dedupe",
    "f10_numeric_sequence": "higher-order-function fold: whole detector "
    "in one codegen'd projection, zero shuffles",
    "a3_overlap_merge": "overlap merge as islands: one shuffle on page, "
    "lag/cumsum/merge all in codegen",
    "f6_name_ratio": "dict side broadcast; big side aggregated once",
    "lang_id_multi": "4-language function-word scoring entirely in "
    "higher-order functions: zero Python, zero shuffles",
    "ann_cosine_topk_ivf": "hyperplane-LSH probe: static bucket "
    "IN-list filter prunes before any exact cosine; "
    "TakeOrderedAndProject top-k",
    "a13_svm_reference_score": "RBF decision is one MapInPandas stage "
    "(numpy matmul per batch); projections stay codegen'd",
    "dedup_paragraph_exact": "explode+md5 in the scan projection; one "
    "map-side-combinable min/count shuffle (no window -> no "
    "mega-duplicate hot-spot); join back + ordered reassembly",
    "scrub_urls_emails": "URL/email redaction + counts as pure regex "
    "projections: zero Python, zero shuffles",
    # --- round 3 additions ---
    "boilerplate_strip": "the broadcast side is the frequency table "
    "FILTERED to boilerplate-only segments (>=30% of a source's docs) "
    "— the full distinct-segment table grows with the corpus and must "
    "never broadcast; left join, null -> not-boilerplate",
    "dedup_ngram_jaccard": "id-window blocking lowered to a "
    "(lang, grid-cell) EQUI-join via a 2-cell explode of the right "
    "side — hash join, no nested-loop, each pair matched exactly once; "
    "NOTE: the shingle table is checkpoint-fenced, so the plan roots at "
    "Scan ExistingRDD and scan-pushdown evidence lives in the pre-fence "
    "stage, not in this report",
    "dedup_simhash": "64-bit production SimHash: token md5s projected "
    "once, 4x16-bit chunk columns keep each codegen'd aggregate "
    "bounded",
    "dedup_simhash_pairs": "chunk-blocked Hamming join (Manku-style): "
    "explode to 4 (chunk_idx, value) keys -> hash self-join; "
    "pigeonhole gives FULL recall at Hamming<=3 with zero theta-joins",
    "a12_kmeans_centers": "k-means assign is a pure projection "
    "(k-distance array + array_position argmin over center literals) "
    "— the per-iteration plan has no Exchange before the mean agg",
    "j6_asof_join": "as-of join as union + one shuffle + "
    "last(ignorenulls) over a total-ordered window — no per-key "
    "nested loop",
    "hypertable_rollup": "hour/day/total continuous aggregate in ONE "
    "pass: partial ROLLUP grouping sets inside a single shuffle",
    "sketch_count_min": "count-min build: the item stream collapses to "
    "(item, count) map-side BEFORE hashing (md5 cost scales with "
    "distinct items, not occurrences); 2 md5s per distinct item feed 4 "
    "depth-cells (12-hex chunks, CSE'd in one projection); the "
    "<= depth*width sketch auto-broadcasts into the probe join",
    # --- round 4 additions ---
    "near_dup_dedup": "the composed near-dup pipeline's FINAL stage "
    "(member re-attach): exact-group members hash-join their "
    "canonical's cluster label — the earlier stages (collapse, LSH, "
    "Jaccard, pointer-jumping CC) run eagerly behind checkpoint "
    "fences, so this plan roots at the closure output; mega-buckets "
    "of identical text never reach the pairwise stage",
    "lsh_dedup_clusters": "star-edge cluster path: per-bucket "
    "(min, count) aggregation emits B-1 edges per B-doc bucket — the "
    "plan shows the hub agg + join back with NO window over the "
    "bucket, so a mega-bucket partial-aggregates instead of "
    "hot-spotting one task",
    "pipeline_masks": "the mask sink renders SVGs inside the SAME "
    "MapInArrow stage as the kernel (plans/masks.py): one narrow "
    "stage over the scan, zero shuffles, no driver collection — the "
    "sink inherits the extraction plan's perfectly parallel shape",
    "p2_drop_spatial": "drop-spatial as column pruning: after the "
    "regions explode only (conv_id, turn_idx, line_height, font) "
    "survive the projection, so the spatial doubles are never "
    "serialized past the kernel stage",
    "dedup_substring_stats": "substring-span dedup (fused stats "
    "path): the n-gram md5 windowing is a codegen'd higher-order "
    "transform in the scan projection; corpus-wide gram counting is "
    "ONE map-side-combinable aggregation on the gram hash (the "
    "driver's min_docs=1 default — a two-level (gram,doc)->(gram) "
    "split only when min_docs>1 constrains), so a boilerplate gram "
    "repeated 10^9 times partial-aggregates instead of hot-spotting "
    "one task; the duplicated-gram set BROADCASTS onto the seed "
    "table as a left marker (1:1 per seed, no expansion) and the "
    "island merge is one F.aggregate fold over each document's "
    "sorted seed positions inside the final per-doc aggregation — "
    "the driver query pre-partitions the doc table by doc_id "
    "(_spread_by), so that aggregation reuses the input partitioning "
    "and the EXPLODED seed table is never shuffled (the one exchange "
    "moves compact doc rows before the fan-out) — NOTE: the seed "
    "table is checkpoint-fenced (feeds both the count and the "
    "probe), so the plan roots at Scan ExistingRDD and the "
    "scan-stage evidence lives in the pre-fence projection",
    "sketch_bloom": "bloom filter build + probe: one map-side-"
    "combinable distinct of <= n_bits rows (a mega-duplicate item "
    "combines away in the scan stage); the probe side dedups, "
    "explodes to k bit positions, and the set-bit table broadcasts "
    "into the membership join — the corpus is never shuffled",
    "text_bm25": "BM25 scoring: the query-term filter lands on the "
    "fenced (doc, term, tf) count table BEFORE the joins; the "
    "doc-frequency side (<= |query| rows) and the corpus-scalar "
    "single-row frame both broadcast, so the only shuffled relation "
    "is the matching rows themselves; document lengths derive from "
    "the count table (sum of tf), so the corpus is tokenized exactly "
    "once",
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pdfextract_spark.plans.driver_queries import QUERIES

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    out = [
        "# PLANS — physical-plan evidence (generated by tools/plan_report.py)",
        "",
        "Checks that the plans Catalyst produces are the plans we want at",
        "100 TB: filters/projections reach the scan, small sides broadcast,",
        "aggregations are map-side partial, top-k lowers to group limits,",
        "and expression work stays inside whole-stage codegen.",
        "",
    ]
    for name, why in REPRESENTATIVE.items():
        df = QUERIES[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed = [p for p in pushed if p.strip()]
        schemas = re.findall(r"ReadSchema: struct<([^>]*)", plan)
        feats = {
            "BroadcastHashJoin": "BroadcastHashJoin" in plan,
            "ShuffledHashJoin": "ShuffledHashJoin" in plan,
            "partial aggregate": "HashAggregate" in plan
            and plan.count("HashAggregate") >= 2,
            "WindowGroupLimit": "WindowGroupLimit" in plan,
            "TakeOrderedAndProject": "TakeOrderedAndProject" in plan,
            "codegen stages": len(set(re.findall(r"codegen id : (\d+)", plan))),
            "exchanges (shuffles)": plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning"),
        }
        out.append(f"## {name}")
        out.append("")
        out.append(f"*{why}*")
        out.append("")
        if pushed:
            out.append(f"- PushedFilters: `{pushed[0][:120]}`")
        for s in schemas[:2]:
            out.append(f"- ReadSchema: `struct<{s[:110]}>`")
        for k, v in feats.items():
            if v:
                out.append(f"- {k}: {v}")
        out.append("")
    with open(f"{ROOT}/PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote PLANS.md ({len(REPRESENTATIVE)} plans)")


if __name__ == "__main__":
    main()
