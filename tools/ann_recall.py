"""ANN recall benchmark (round-4 evidence item): recall@k of the
hyperplane-LSH IVF search (operators/similarity.cosine_topk_ivf) vs
exact brute force at n~=10^5 synthetic 64-dim embeddings, swept over
(n_planes, probe radius) — the table a 100-TB user reads to pick
parameters.

Method: per query, ONE Spark job computes every vector's exact cosine
plus its sign bucket for each plane count; the true top-k (collected
with buckets attached) then decides recall for every (planes, radius)
cell driver-side — a true neighbor is recalled iff its bucket lies
within Hamming ``radius`` of the query's bucket, which is exactly the
IVF candidate predicate.  Candidate fraction (the scan-cost proxy:
what share of the table the pruned exact-cosine pass reads) comes from
one global bucket histogram.  This evaluates the REAL operator's
selection rule without running planes x radius x queries separate
top-k jobs.

Two populations, both deterministic (fixed numpy seed):
- "uniform": i.i.d. Gaussian directions — the worst case for sign-LSH
  (no structure to exploit);
- "clustered": 200 Gaussian clusters (sigma=0.35 around unit
  centers) — the shape real embedding corpora have; queries are
  perturbed members, the ANN-relevant regime.

Usage: python tools/ann_recall.py [n] [k] [cores]
Prints one JSON line per (population, n_planes, radius) plus a
markdown summary table for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)

N_QUERIES = 20
PLANE_COUNTS = (6, 8)
RADII = (0, 1, 2, 3)


def make_population(kind: str, n: int, dim: int, rng):
    import numpy as np

    if kind == "uniform":
        v = rng.standard_normal((n, dim))
    else:
        n_clusters = 200
        centers = rng.standard_normal((n_clusters, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = rng.integers(0, n_clusters, n)
        v = centers[assign] + 0.35 * rng.standard_normal((n, dim))
    return v


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    dim = 64

    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pdfextract_spark.operators.similarity import (
        cosine,
        cosine_topk,
        cosine_topk_ivf,
        lsh_bucket,
        probe_buckets,
        seeded_hyperplanes,
    )

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("ann-recall")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    planes = {p: seeded_hyperplanes(p, dim, seed=7) for p in PLANE_COUNTS}
    rows_md = []

    for kind in ("clustered", "uniform"):
        v = make_population(kind, n, dim, rng)
        pdf = pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": [r.tolist() for r in v],
            }
        )
        df = (
            spark.createDataFrame(pdf, "vec_id bigint, embedding array<double>")
            .repartition(cores * 2)
            .cache()
        )
        df.count()

        vec = F.col("embedding").cast("array<double>")
        buck = df.select(
            "vec_id",
            "embedding",
            *[
                lsh_bucket(vec, planes[p]).alias(f"b{p}")
                for p in PLANE_COUNTS
            ],
        ).cache()
        buck.count()

        # global bucket histograms -> candidate fractions
        hist = {
            p: {
                r["b"]: r["c"]
                for r in buck.groupBy(F.col(f"b{p}").alias("b"))
                .agg(F.count("*").alias("c"))
                .collect()
            }
            for p in PLANE_COUNTS
        }

        # queries: perturbed members (clustered) / random directions
        qidx = rng.integers(0, n, N_QUERIES)
        queries = v[qidx] + 0.1 * rng.standard_normal((N_QUERIES, dim))

        recalls = {
            (p, r): [] for p in PLANE_COUNTS for r in RADII
        }
        fracs = {(p, r): [] for p in PLANE_COUNTS for r in RADII}
        for qi in range(N_QUERIES):
            qv = [float(x) for x in queries[qi]]
            q = F.array(*[F.lit(x) for x in qv])
            top = (
                buck.select(
                    "vec_id",
                    *[f"b{p}" for p in PLANE_COUNTS],
                    cosine(vec, q).alias("cos"),
                )
                .orderBy(F.col("cos").desc(), "vec_id")
                .limit(k)
                .collect()
            )
            for p in PLANE_COUNTS:
                for r in RADII:
                    probes = set(probe_buckets(qv, planes[p], r))
                    got = sum(1 for t in top if t[f"b{p}"] in probes)
                    recalls[(p, r)].append(got / k)
                    fracs[(p, r)].append(
                        sum(hist[p].get(b, 0) for b in probes) / n
                    )

        # sanity: the driver-side rule equals the real operator on one
        # config (same ids), and time one real IVF call vs brute force
        qv = [float(x) for x in queries[0]]
        ivf_ids = {
            r["vec_id"]
            for r in cosine_topk_ivf(
                df, qv, k=k, n_planes=6, radius=2
            ).collect()
        }
        probes0 = set(probe_buckets(qv, planes[6], 2))
        rule_ids_df = (
            buck.where(F.col("b6").isin(list(probes0)))
            .select(
                "vec_id", F.round(cosine(vec, F.array(*[F.lit(x) for x in qv])), 4).alias("cos_sim")
            )
            .orderBy(F.col("cos_sim").desc(), "vec_id")
            .limit(k)
            .collect()
        )
        assert ivf_ids == {r["vec_id"] for r in rule_ids_df}, (
            "driver-side selection rule diverged from cosine_topk_ivf"
        )
        t0 = time.time()
        cosine_topk(df, qv, k=k).collect()
        t_brute = time.time() - t0
        t0 = time.time()
        cosine_topk_ivf(df, qv, k=k, n_planes=6, radius=2).collect()
        t_ivf = time.time() - t0

        for p in PLANE_COUNTS:
            for r in RADII:
                rec = round(float(np.mean(recalls[(p, r)])), 3)
                frac = round(float(np.mean(fracs[(p, r)])), 3)
                line = {
                    "population": kind,
                    "n": n,
                    "k": k,
                    "n_planes": p,
                    "radius": r,
                    "recall_at_k": rec,
                    "candidate_fraction": frac,
                    "queries": N_QUERIES,
                }
                print(json.dumps(line))
                rows_md.append(
                    f"| {kind} | {p} | {r} | {rec:.3f} | {frac:.3f} |"
                )
        print(
            json.dumps(
                {
                    "population": kind,
                    "timing_one_query_sec": {
                        "brute": round(t_brute, 3),
                        "ivf_p6_r2": round(t_ivf, 3),
                    },
                }
            )
        )
        df.unpersist()
        buck.unpersist()

    print("\n| population | planes | radius | recall@%d | cand. frac |" % k)
    print("|---|---|---|---|---|")
    for row in rows_md:
        print(row)


if __name__ == "__main__":
    main()
