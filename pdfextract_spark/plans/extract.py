"""The end-to-end extraction plan (SURVEY.md §3 "Our Spark lifecycle").

Every stage of the reference pipeline is page/document-local
(pdf.rb:127-162) and a turn plays the role of a document, so the whole
chars -> chunks -> regions -> margins -> zones -> columns -> sections
-> titles -> references cascade is a pure function of one row's text.
The plan is therefore a single narrow ``mapInArrow`` over the
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

from ..core import extract_turn, render_turn  # noqa: F401 (render_turn: oracle path)
from ..core.language import transliterate
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

CHUNK_T = StructType(
    [
        StructField("x", _D),
        StructField("y", _D),
        StructField("width", _D),
        StructField("height", _D),
        StructField("line_height", _D),
        StructField("content", _S),
        StructField("font", _S),
        StructField("page", _I),
    ]
)

CHAR_T = CHUNK_T  # same shape; content is a single glyph

MARGIN_T = StructType(
    [
        StructField("side", _S),
        StructField("x", _D),
        StructField("y", _D),
        StructField("width", _D),
        StructField("height", _D),
        StructField("page", _I),
    ]
)

METRICS_T = StructType(
    [
        StructField("chars_in", LongType()),
        StructField("chars_truncated", LongType()),
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
        StructField("characters", ArrayType(CHAR_T)),
        StructField("chunks", ArrayType(CHUNK_T)),
        StructField("margins", ArrayType(MARGIN_T)),
        StructField("metrics", METRICS_T),
    ]
)


def _ident(v):
    return v


def _region_row(r: dict, rnd=_ident, tx=_ident) -> dict:
    """Schema-aware render: rounding (xml_view.rb:24-29) and content
    transliteration (xml_view.rb:92-94) applied per known field — much
    cheaper than a generic deep walk at millions of turns."""
    return {
        "x": rnd(r["x"]),
        "y": rnd(r["y"]),
        "width": rnd(r["width"]),
        "height": rnd(r["height"]),
        "line_height": rnd(r["line_height"]),
        "font": r["font"],
        "page": r["page"],
        "lines": [
            {
                "content": tx(l["content"]),
                "x_offset": rnd(l["x_offset"]),
                "y_offset": rnd(l["y_offset"]),
                "spacing": rnd(l["spacing"]),
            }
            for l in r.get("lines", [])
        ],
    }


def _section_row(s: dict, content: str, rnd=_ident, tx=_ident) -> dict:
    return {
        "content": tx(content),
        "letter_ratio": rnd(s["letter_ratio"]),
        "year_ratio": rnd(s["year_ratio"]),
        "cap_ratio": rnd(s["cap_ratio"]),
        "name_ratio": rnd(s["name_ratio"]),
        "word_count": s["word_count"],
        "lateness": rnd(s["lateness"]),
        "reference_score": rnd(s["reference_score"]),
        "line_height": rnd(s.get("line_height")),
        "font": s.get("font"),
        "lines": [
            {
                "content": tx(l["content"]),
                "x_offset": rnd(l["x_offset"]),
                "y_offset": rnd(l["y_offset"]),
                "spacing": rnd(l["spacing"]),
            }
            for l in s.get("lines", [])
        ],
        "components": [
            {
                "x": rnd(c["x"]),
                "y": rnd(c["y"]),
                "width": rnd(c["width"]),
                "height": rnd(c["height"]),
                "page": c["page"],
            }
            for c in s.get("components", [])
        ],
    }


def _chunk_row(c: dict, rnd=_ident, tx=_ident) -> dict:
    return {
        "x": rnd(c["x"]),
        "y": rnd(c["y"]),
        "width": rnd(c["width"]),
        "height": rnd(c["height"]),
        "line_height": rnd(c["line_height"]),
        "content": tx(c["content"]),
        "font": c["font"],
        "page": c["page"],
    }


# DEFAULT_ARTIFACTS is what extract() emits when ``want`` is omitted
# (matches the golden fixtures).  The full ARTIFACT_FIELDS adds the
# reference CLI's debug artifacts (--characters/--chunks/--margins),
# opt-in because a per-char row set dwarfs the real outputs.
DEFAULT_ARTIFACTS = ("title", "regions", "zones", "columns", "sections", "references")
ARTIFACT_FIELDS = DEFAULT_ARTIFACTS + ("characters", "chunks", "margins")


def extract(
    df: DataFrame,
    settings: Settings = DEFAULT,
    rendered: bool = True,
    repartition: int | None = None,
    want: tuple[str, ...] | None = None,
    on_error: str = "fail",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, ...) -> one result row
    per turn with nested extraction artifacts.

    ``rendered=True`` applies the canonical sink transform (2-dp
    rounding + transliteration, xml_view.rb:24-29/92-94) so outputs
    are fixture-comparable.

    ``want`` projects the OUTPUT to a subset of artifact columns
    (SURVEY.md S8, the reference's explicit-only rendering): the
    kernel's cost is turn-local either way, but serializing the full
    nested row costs ~4x a references-only row, so consumers that read
    one artifact should ask for just it.

    ``on_error``: ``"fail"`` (default) re-raises any kernel exception
    wrapped with the offending (conv_id, turn_idx) so a failure in a
    10^12-turn job is attributable without bisection; ``"skip"`` emits
    a sentinel row instead (``page_count = -1``, empty artifacts,
    metrics carrying chars_in only) so one poison turn cannot kill the
    job — filter ``page_count >= 0`` downstream, count the rest.

    ``carry``: extra INPUT columns passed through to the output
    verbatim (the stage is 1:1 row-for-row, so they copy straight from
    the input Arrow batch with zero per-row Python cost) — e.g.
    ``carry=("ts",)`` keeps the event-time column for a downstream
    watermarked streaming aggregation.
    """
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")
    from ..core.spatial import get_text_content

    selected = DEFAULT_ARTIFACTS if want is None else tuple(want)
    unknown = [w for w in selected if w not in ARTIFACT_FIELDS]
    if unknown:
        raise ValueError(
            f"unknown want artifact(s) {unknown}; valid names are "
            f"{sorted(ARTIFACT_FIELDS)} — a misspelling (e.g. "
            f"'titles' for 'title') would otherwise silently return "
            f"rows with the artifact missing"
        )
    computed = StructType(
        [
            f
            for f in RESULT_SCHEMA.fields
            if f.name not in ARTIFACT_FIELDS or f.name in selected
        ]
    )
    # reject carries colliding with OUTPUT fields, and also with the
    # base INPUT selection below — carry=("text",) would otherwise put
    # a duplicate 'text' column into src.select and the stage would
    # only work by coincidence of Arrow's duplicate-field-name lookup
    base_inputs = ("conv_id", "turn_idx", "role", "text")
    clash = [
        c
        for c in carry
        if c in computed.fieldNames() or c in base_inputs
    ]
    if clash:
        raise ValueError(
            f"carry columns collide with output or base input "
            f"(conv_id/turn_idx/role/text): {clash}"
        )
    schema = StructType(
        list(computed.fields) + [df.schema[c] for c in carry]
    )

    src = df.select("conv_id", "turn_idx", "role", "text", *carry)
    if repartition:
        src = src.repartition(
            repartition, F.xxhash64(F.col("conv_id"), F.col("turn_idx"))
        )

    precision = settings.precision

    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(schema)
    computed_arrow = to_arrow_schema(computed)

    def run(batches):
        """Arrow-native stage: consume pyarrow RecordBatches, run the
        per-turn kernel, emit typed RecordBatches directly.  Bypassing
        the pandas object path cuts serialization from ~10x kernel cost
        to a small constant (pa.array over python structs is C-side)."""
        if rendered:
            def rnd(v):
                return None if v is None else round(v, precision)

            tx = transliterate
        else:
            rnd = tx = _ident
        kernel_want = tuple(
            {"title": "titles"}.get(k, k) for k in selected
        )
        for batch in batches:
            # convert ONLY the four kernel inputs to Python objects:
            # carry columns are copied verbatim from the Arrow batch
            # below, so a full to_pydict would pay O(rows x width)
            # object conversion for data the loop never reads
            names = batch.schema.names
            pdf = {
                c: batch.column(names.index(c)).to_pylist()
                for c in ("conv_id", "turn_idx", "role", "text")
            }
            # column-wise accumulation: one Python list per output
            # field, converted once by pa.array — avoids building a
            # per-turn row dict plus a second all-rows pass per field
            cols: dict[str, list] = {f.name: [] for f in computed_arrow}
            for conv_id, turn_idx, role, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["role"], pdf["text"]
            ):
                try:
                    res = extract_turn(text or "", settings, want=kernel_want)
                except Exception as exc:
                    if on_error == "fail":
                        raise RuntimeError(
                            f"extraction failed for conv_id={conv_id!r} "
                            f"turn_idx={turn_idx}: {type(exc).__name__}: {exc}"
                        ) from exc
                    res = {
                        "page_count": -1,
                        "metrics": {
                            "chars_in": len(text or ""),
                            "chars_truncated": 0,
                            "regions_found": 0,
                            "sections_found": 0,
                            "refs_matched": 0,
                        },
                    }
                # a NULL turn_idx (permissive JSON reads keep
                # malformed rows as all-NULL) must obey on_error: the
                # int() coercion sat OUTSIDE the kernel try, so one
                # poison row killed the job even under 'skip'
                if turn_idx is None and on_error == "fail":
                    raise RuntimeError(
                        f"NULL turn_idx for conv_id={conv_id!r} "
                        f"(malformed input row — permissive read?); "
                        f"clean the input or pass on_error='skip'"
                    )
                cols["conv_id"].append(conv_id)
                cols["turn_idx"].append(
                    None if turn_idx is None else int(turn_idx)
                )
                cols["role"].append(role)
                cols["page_count"].append(res["page_count"])
                cols["metrics"].append(res["metrics"])
                if "title" in selected:
                    title = res.get("title")
                    if title is not None:
                        title = {
                            "content": tx(title["content"]),
                            "line_height": rnd(title["line_height"]),
                            "font": title["font"],
                        }
                    cols["title"].append(title)
                if "regions" in selected:
                    cols["regions"].append(
                        [_region_row(r, rnd, tx) for r in res.get("regions") or []]
                    )
                if "zones" in selected:
                    cols["zones"].append(
                        [
                            {
                                "zone": z["group"],
                                "x": rnd(z["x"]),
                                "y": rnd(z["y"]),
                                "width": rnd(z["width"]),
                                "height": rnd(z["height"]),
                                "page": z["page"],
                            }
                            for z in res.get("zones") or []
                        ]
                    )
                if "columns" in selected:
                    cols["columns"].append(
                        [
                            {
                                "x": rnd(c["x"]),
                                "y": rnd(c["y"]),
                                "width": rnd(c["width"]),
                                "height": rnd(c["height"]),
                                "page": c["page"],
                            }
                            for c in res.get("columns") or []
                        ]
                    )
                if "sections" in selected:
                    cols["sections"].append(
                        [
                            _section_row(s, get_text_content(s), rnd, tx)
                            for s in res.get("sections") or []
                        ]
                    )
                if "references" in selected:
                    cols["references"].append(
                        [
                            {"content": tx(r["content"]), "order": r.get("order")}
                            for r in res.get("references") or []
                        ]
                    )
                if "characters" in selected:
                    cols["characters"].append(
                        [_chunk_row(c, rnd, tx) for c in res.get("characters") or []]
                    )
                if "chunks" in selected:
                    ch = res.get("chunks") or {}
                    cols["chunks"].append(
                        [
                            _chunk_row(c, rnd, tx)
                            for pg in sorted(ch)
                            for c in ch[pg]
                        ]
                    )
                if "margins" in selected:
                    mp = res.get("margins") or {}
                    cols["margins"].append(
                        [
                            {
                                "side": side,
                                "x": rnd(m["x"]),
                                "y": rnd(m["y"]),
                                "width": rnd(m["width"]),
                                "height": rnd(m["height"]),
                                "page": m["page"],
                            }
                            for pg in sorted(mp)
                            for side, m in mp[pg].items()
                        ]
                    )
            arrays = [
                pa.array(cols[field.name], type=field.type)
                for field in computed_arrow
            ]
            for c in carry:
                # 1:1 row mapping: carried columns copy verbatim from
                # the input batch (no per-row Python), cast only if the
                # input conversion chose a different arrow flavor
                col = batch.column(batch.schema.get_field_index(c))
                want_t = arrow_schema.field(c).type
                if col.type != want_t:
                    col = col.cast(want_t)
                arrays.append(col)
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    return src.mapInArrow(run, schema=schema)


def extract_exploded(df: DataFrame, artifact: str, **kw) -> DataFrame:
    """Convenience: one row per extracted artifact (region / section /
    reference / zone / column), keyed by (conv_id, turn_idx).  Pure
    Catalyst explode over the nested plan output — and the plan only
    computes/serializes the requested artifact (S8 projection)."""
    if artifact == "titles":
        res = extract(df, want=("title",), **kw)
        return res.select(
            "conv_id", "turn_idx", "title.*"
        ).where(F.col("content").isNotNull())
    res = extract(df, want=(artifact,), **kw)
    return res.select(
        "conv_id",
        "turn_idx",
        F.explode(artifact).alias("a"),
    ).select("conv_id", "turn_idx", "a.*")
