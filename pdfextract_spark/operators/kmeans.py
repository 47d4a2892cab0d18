"""K-means clustering (SURVEY.md A12; reference: lib/pdf/extract/
kmeans.rb:41-111).

The reference ships a driver-local Lloyd's implementation (random or
caller-supplied init, assign-to-nearest, recompute means, drop empty
clusters, stop at max centre delta <= ``delta``).  It is dead code
there — never called from any ``after`` block — but re-expressed here
as a first-class distributed operator so the inventory row is closed:

- items stay a DataFrame; each iteration is a shuffle-FREE argmin
  assignment (the k centers are driver-side constants, so the
  distance array + array_position(array_min) is a pure codegen
  projection — no crossJoin, no window, no Exchange) followed by one
  map-side-combinable groupBy mean.  Only the k centre rows ever reach
  the driver per iteration (the same driver-sized state MLlib's
  KMeans keeps).
- ties in the argmin go to the lowest cluster id, matching the
  reference's first-minimum scan (kmeans.rb:68-79).
- empty clusters are dropped implicitly (groupBy emits no row), as in
  kmeans.rb:84-86.
- init must be EXPLICIT (a list of coordinate dicts) or ``init_first_k``
  (the k items with the smallest ``id_col`` — deterministic and
  SQL-replicable); the reference's ``rand`` path has no place in a
  reproducible pipeline.
- iteration runs ``max_iter`` rounds, optionally stopping early when
  the max centre movement is <= ``delta`` (the reference's criterion).
  Oracle-checked queries pin ``delta=0.0`` so both engines run the
  exact same number of rounds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans(
    df: DataFrame,
    keys: list[str],
    k: int,
    id_col: str,
    init: list[dict] | None = None,
    max_iter: int = 5,
    delta: float = 0.0,
) -> tuple[list[dict], DataFrame]:
    """Lloyd's k-means over ``df[keys]``.

    Returns ``(centers, assigned)``: the final centre list (dicts with
    ``cid``, each key, and ``n`` members) and the assignment DataFrame.
    Both describe the SAME final round: ``centers`` are the means of
    the last executed assignment, ``n`` its member counts, and
    ``assigned`` that assignment itself (cids renumbered consistently
    with the centre list when empty clusters were dropped) — so the
    two outputs always cross-tabulate.

    ``df`` must not already carry a ``cid`` column (same contract
    style as resolve/rangejoin).
    """
    reserved = {"cid"}
    clash = [c for c in df.columns if c in reserved]
    if clash:
        raise ValueError(
            f"df already has reserved column(s) {clash}; rename them "
            f"before calling kmeans (e.g. when re-clustering a prior "
            f"assignment output, drop/alias its 'cid')"
        )
    if init is None:
        # deterministic init: the k items with the smallest id
        rows = df.orderBy(id_col).limit(k).collect()
        init = [{key: float(r[key]) for key in keys} for r in rows]
    centers = [dict(c) for c in init]

    def assign(centers_now: list[dict]) -> DataFrame:
        # Shuffle-FREE argmin: the k centers are driver-side constants,
        # so the distance to each is a literal expression — build the
        # k-element distance array in the scan projection and take
        # array_position(array_min) (first occurrence = lowest cid,
        # the reference's first-minimum tie-break, kmeans.rb:68-79).
        # The former crossJoin(broadcast)+row_number shape shuffled
        # n*k rows through a window per iteration; this stays entirely
        # in whole-stage codegen with zero Exchange.
        def dist_to(c: dict):
            dist = None
            for key in keys:
                d = F.col(key) - F.lit(float(c[key]))
                dist = d * d if dist is None else dist + d * d
            return dist

        darr = F.array(*[dist_to(c) for c in centers_now])
        cid = (F.array_position(darr, F.array_min(darr)) - 1).cast("bigint")
        # null feature -> every distance null -> array_position null;
        # the former row_number form ordered NULL distances first and
        # assigned such rows cluster 0 — preserve that behavior
        return df.withColumn("cid", F.coalesce(cid, F.lit(0).cast("bigint")))

    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    for _ in range(max_iter):
        assigned = assign(centers)
        new_rows = (
            assigned.groupBy("cid")
            .agg(
                *[F.avg(key).alias(key) for key in keys],
                F.count("*").alias("n"),
            )
            .collect()
        )
        new_centers = [
            {"cid": r["cid"], "n": r["n"], **{key: r[key] for key in keys}}
            for r in sorted(new_rows, key=lambda r: r["cid"])
        ]
        moved = 0.0
        by_cid = {c["cid"]: c for c in new_centers}
        for cid, old in enumerate(centers):
            if cid in by_cid:
                moved = max(
                    moved,
                    math.sqrt(
                        sum(
                            (old[key] - by_cid[cid][key]) ** 2
                            for key in keys
                        )
                    ),
                )
        # surviving clusters renumber positionally (the reference's
        # list compaction after rejecting empty clusters)
        centers = [{key: c[key] for key in keys} for c in new_centers]
        if delta > 0 and moved <= delta:
            break

    final = [
        {"cid": i, **{key: c[key] for key in keys}, "n": c["n"]}
        for i, c in enumerate(new_centers)
    ]
    # the returned assignment is the one that PRODUCED the final means
    # (same round as `n`), with cids remapped to the compacted ids so
    # it matches the centre list when empty clusters were dropped
    remap = {c["cid"]: i for i, c in enumerate(new_centers)}
    out = assigned
    if any(old != new for old, new in remap.items()):
        mapping = F.create_map(
            *[F.lit(x) for pair in remap.items() for x in pair]
        )
        out = assigned.withColumn("cid", mapping[F.col("cid")])
    return final, out
