"""The end-to-end extraction plan (SURVEY.md §3 "Our Spark lifecycle").

Every stage of the reference pipeline is page/document-local
(pdf.rb:127-162) and a turn plays the role of a document, so the whole
chars -> chunks -> regions -> margins -> zones -> columns -> sections
-> titles -> references cascade is a pure function of one row's text.
The plan is therefore a single narrow ``mapInPandas`` over the
transcript table: **zero shuffles**, no driver collection, perfectly
linear scaling with executors.  Explicit ``repartition`` by
``xxhash64(conv_id, turn_idx)`` balances input splits when the source
layout is skewed (long conversations landing in one file).

Arrow batches cross the JVM/Python boundary once; inside the batch the
per-turn kernel (core/pipeline.py) does the sequential merges the
reference defines (the parts Catalyst cannot express without semantic
drift — SURVEY.md §4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..core import extract_turn, render_turn
from ..settings import DEFAULT, Settings

_D = DoubleType()
_I = IntegerType()
_S = StringType()

LINE_T = StructType(
    [
        StructField("content", _S),
        StructField("x_offset", _D),
        StructField("y_offset", _D),
        StructField("spacing", _D),
    ]
)

REGION_T = StructType(
    [
        StructField("x", _D),
        StructField("y", _D),
        StructField("width", _D),
        StructField("height", _D),
        StructField("line_height", _D),
        StructField("font", _S),
        StructField("page", _I),
        StructField("lines", ArrayType(LINE_T)),
    ]
)

COMPONENT_T = StructType(
    [
        StructField("x", _D),
        StructField("y", _D),
        StructField("width", _D),
        StructField("height", _D),
        StructField("page", _I),
    ]
)

SECTION_T = StructType(
    [
        StructField("content", _S),
        StructField("letter_ratio", _D),
        StructField("year_ratio", _D),
        StructField("cap_ratio", _D),
        StructField("name_ratio", _D),
        StructField("word_count", _I),
        StructField("lateness", _D),
        StructField("reference_score", _D),
        StructField("line_height", _D),
        StructField("font", _S),
        StructField("lines", ArrayType(LINE_T)),
        StructField("components", ArrayType(COMPONENT_T)),
    ]
)

ZONE_T = StructType(
    [
        StructField("zone", _S),
        StructField("x", _D),
        StructField("y", _D),
        StructField("width", _D),
        StructField("height", _D),
        StructField("page", _I),
    ]
)

COLUMN_T = StructType(
    [
        StructField("x", _D),
        StructField("y", _D),
        StructField("width", _D),
        StructField("height", _D),
        StructField("page", _I),
    ]
)

TITLE_T = StructType(
    [
        StructField("content", _S),
        StructField("line_height", _D),
        StructField("font", _S),
    ]
)

REFERENCE_T = StructType(
    [StructField("content", _S), StructField("order", _I)]
)

METRICS_T = StructType(
    [
        StructField("chars_in", LongType()),
        StructField("regions_found", _I),
        StructField("sections_found", _I),
        StructField("refs_matched", _I),
    ]
)

RESULT_SCHEMA = StructType(
    [
        StructField("conv_id", _S),
        StructField("turn_idx", _I),
        StructField("role", _S),
        StructField("page_count", _I),
        StructField("title", TITLE_T),
        StructField("regions", ArrayType(REGION_T)),
        StructField("zones", ArrayType(ZONE_T)),
        StructField("columns", ArrayType(COLUMN_T)),
        StructField("sections", ArrayType(SECTION_T)),
        StructField("references", ArrayType(REFERENCE_T)),
        StructField("metrics", METRICS_T),
    ]
)


def _region_row(r: dict) -> dict:
    return {
        "x": r["x"],
        "y": r["y"],
        "width": r["width"],
        "height": r["height"],
        "line_height": r["line_height"],
        "font": r["font"],
        "page": r["page"],
        "lines": [
            {
                "content": l["content"],
                "x_offset": l["x_offset"],
                "y_offset": l["y_offset"],
                "spacing": l["spacing"],
            }
            for l in r.get("lines", [])
        ],
    }


def _section_row(s: dict, content: str) -> dict:
    return {
        "content": content,
        "letter_ratio": s["letter_ratio"],
        "year_ratio": s["year_ratio"],
        "cap_ratio": s["cap_ratio"],
        "name_ratio": s["name_ratio"],
        "word_count": s["word_count"],
        "lateness": s["lateness"],
        "reference_score": s["reference_score"],
        "line_height": s.get("line_height"),
        "font": s.get("font"),
        "lines": [
            {
                "content": l["content"],
                "x_offset": l["x_offset"],
                "y_offset": l["y_offset"],
                "spacing": l["spacing"],
            }
            for l in s.get("lines", [])
        ],
        "components": [
            {
                "x": c["x"],
                "y": c["y"],
                "width": c["width"],
                "height": c["height"],
                "page": c["page"],
            }
            for c in s.get("components", [])
        ],
    }


def extract(
    df: DataFrame,
    settings: Settings = DEFAULT,
    rendered: bool = True,
    repartition: int | None = None,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, ...) -> one result row
    per turn with nested extraction artifacts.

    ``rendered=True`` applies the canonical sink transform (2-dp
    rounding + transliteration, xml_view.rb:24-29/92-94) so outputs
    are fixture-comparable.
    """
    from ..core.spatial import get_text_content

    src = df.select("conv_id", "turn_idx", "role", "text")
    if repartition:
        src = src.repartition(
            repartition, F.xxhash64(F.col("conv_id"), F.col("turn_idx"))
        )

    def run(batches):
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, role, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["role"], pdf["text"]
            ):
                res = extract_turn(text or "", settings)
                if rendered:
                    res = render_turn(res, settings)
                secs = []
                for s in res.get("sections") or []:
                    content = get_text_content(s)
                    secs.append(_section_row(s, content))
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": int(turn_idx),
                        "role": role,
                        "page_count": res["page_count"],
                        "title": res.get("title"),
                        "regions": [
                            _region_row(r) for r in res.get("regions") or []
                        ],
                        "zones": [
                            {
                                "zone": z["group"],
                                "x": z["x"],
                                "y": z["y"],
                                "width": z["width"],
                                "height": z["height"],
                                "page": z["page"],
                            }
                            for z in res.get("zones") or []
                        ],
                        "columns": [
                            {
                                "x": c["x"],
                                "y": c["y"],
                                "width": c["width"],
                                "height": c["height"],
                                "page": c["page"],
                            }
                            for c in res.get("columns") or []
                        ],
                        "sections": secs,
                        "references": [
                            {"content": r["content"], "order": r.get("order")}
                            for r in res.get("references") or []
                        ],
                        "metrics": res["metrics"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESULT_SCHEMA])

    return src.mapInPandas(run, schema=RESULT_SCHEMA)


def extract_exploded(df: DataFrame, artifact: str, **kw) -> DataFrame:
    """Convenience: one row per extracted artifact (region / section /
    reference / zone / column), keyed by (conv_id, turn_idx).  Pure
    Catalyst explode over the nested plan output — no extra UDF work."""
    res = extract(df, **kw)
    if artifact == "titles":
        return res.select(
            "conv_id", "turn_idx", "title.*"
        ).where(F.col("content").isNotNull())
    return res.select(
        "conv_id",
        "turn_idx",
        F.explode(artifact).alias("a"),
    ).select("conv_id", "turn_idx", "a.*")
