"""Unit tests for the chunk/region merge kernels against hand-built
rows (reference: chunks.rb, regions.rb)."""

from pdfextract_spark.core.chunks import chunks_for_page
from pdfextract_spark.core.regions import regions_for_page
from pdfextract_spark.settings import DEFAULT


def ch(x, y, w=5.0, h=10.0, content="a", font="Body"):
    return {
        "x": x, "y": y, "width": w, "height": h, "line_height": h,
        "content": content, "font": font, "page": 1,
        "page_width": 612.0, "page_height": 792.0,
    }


def test_char_join_within_slop():
    # gap 0 <= char_slop*w -> join without separator (chunks.rb:61-65)
    cs = [ch(0, 0, content="a"), ch(5, 0, content="b")]
    out = chunks_for_page(cs, DEFAULT)
    assert len(out) == 1
    assert out[0]["content"] == "ab"
    assert out[0]["width"] == 10.0


def test_word_join_with_space():
    # gap of one glyph -> word join with ' ' (chunks.rb:66-70)
    cs = [ch(0, 0, content="a"), ch(10, 0, content="b")]
    out = chunks_for_page(cs, DEFAULT)
    assert len(out) == 1
    assert out[0]["content"] == "a b"


def test_row_split_beyond_word_slop_then_overlap_remerge():
    # gap > word_slop * char_width -> A2 splits the row; but the A3
    # overlap pass (chunks.rb:85-107) re-merges same-y chunks with NO
    # separator (its TODO at chunks.rb:96 notes slop rules are not
    # applied there).  Faithful output is a single "ab" chunk.
    cs = [ch(0, 0, content="a"), ch(40, 0, content="b")]
    out = chunks_for_page(cs, DEFAULT)
    assert [c["content"] for c in out] == ["ab"]
    # different rows far apart stay separate
    cs = [ch(0, 0, content="a"), ch(40, 50, content="b")]
    out = chunks_for_page(cs, DEFAULT)
    assert sorted(c["content"] for c in out) == ["a", "b"]


def test_char_width_carry_ignores_punct():
    # char_width tracks the last alnum char (chunks.rb:65,70):
    # after a wide punctuation glyph the carried width stays the
    # previous alnum width.
    # With the carry stuck at 5 the word-join limit is 25+5*4=45 < 46,
    # so A2 splits and A3 re-merges WITHOUT a space -> "a.b".
    cs = [
        ch(0, 0, w=5.0, content="a"),
        ch(5, 0, w=20.0, content="."),   # punct: carried width stays 5
        ch(46, 0, content="b"),
    ]
    out = chunks_for_page(cs, DEFAULT)
    assert [c["content"] for c in out] == ["a.b"]
    # An alnum wide glyph DOES update the carry: limit 25+20*4=105 >= 46
    # -> A2 word-joins with a space -> "aW b".
    cs = [
        ch(0, 0, w=5.0, content="a"),
        ch(5, 0, w=20.0, content="W"),
        ch(46, 0, content="b"),
    ]
    out = chunks_for_page(cs, DEFAULT)
    assert [c["content"] for c in out] == ["aW b"]


def test_out_of_order_x_insert():
    # A1 sorted insert by x (chunks.rb:39-44)
    cs = [ch(10, 0, content="b"), ch(0, 0, content="a"), ch(5, 0, content="x")]
    out = chunks_for_page(cs, DEFAULT)
    assert len(out) == 1
    assert out[0]["content"] == "axb"


def test_overlap_merge_cross_rows():
    # A3: slightly different y, >=90% overlap -> merge (chunks.rb:85-107)
    cs = [ch(0, 0.0, content="a"), ch(10, 0.5, content="b")]
    out = chunks_for_page(cs, DEFAULT)
    assert len(out) == 1
    assert out[0]["content"] == "ab"
    assert out[0]["y"] == 0.0
    assert out[0]["height"] == 10.5


def test_no_overlap_merge_below_slop():
    cs = [ch(0, 0.0, content="a"), ch(10, 2.0, content="b")]
    out = chunks_for_page(cs, DEFAULT)
    assert len(out) == 2


def test_empty_chunk_filter():
    # P1 (chunks.rb:111)
    cs = [ch(0, 0, content=" "), ch(0, 20, content="a")]
    out = chunks_for_page(cs, DEFAULT)
    assert [c["content"] for c in out] == ["a"]


def line(x, y, w, content="line", h=10.0):
    return ch(x, y, w=w, h=h, content=content)


def test_region_merge_vertical_islands():
    # A5: lines 3pt apart merge; 18pt apart split (regions.rb:77-98)
    cs = [
        line(72, 100, 400, "bottom"),
        line(72, 113, 400, "middle"),
        line(72, 126, 400, "top"),
        line(72, 160, 400, "other"),
    ]
    regs = regions_for_page(cs, DEFAULT)
    assert len(regs) == 2
    # output sorted top-down (regions.rb:111)
    assert [len(r["lines"]) for r in regs] == [1, 3]
    # lines stored top-down inside the region
    assert [l["content"] for l in regs[1]["lines"]] == ["top", "middle", "bottom"]


def test_region_line_offsets_and_spacing():
    # W5 (regions.rb:27-43)
    cs = [line(72, 100, 400, "b"), line(80, 113, 380, "t")]
    regs = regions_for_page(cs, DEFAULT)
    assert len(regs) == 1
    r = regs[0]
    assert r["y"] == 100 and r["height"] == 23
    top, bottom = r["lines"]
    assert top["x_offset"] == 8.0 and top["y_offset"] == 13.0
    assert top["spacing"] == 0.0
    assert bottom["x_offset"] == 0.0 and bottom["y_offset"] == 0.0
    assert bottom["spacing"] == 3.0
    # P2: spatial attrs dropped from lines (spatial.rb:21-23)
    assert "x" not in top and "page" not in top


def test_region_x_incidence_required():
    # J1: vertically close but x-disjoint lines stay separate
    cs = [line(72, 100, 100, "left"), line(300, 113, 100, "right")]
    regs = regions_for_page(cs, DEFAULT)
    assert len(regs) == 2


def test_collapse_write_order():
    # W8 (spatial.rb:116-133): fold in left-to-right, top-to-bottom order
    from pdfextract_spark.core.spatial import collapse

    objs = [
        ch(100, 100, content="world"),
        ch(0, 100, content="hello"),
        ch(0, 200, content="top"),
    ]
    out = collapse(objs)
    assert out["content"] == "tophelloworld"
    assert out["x"] == 0 and out["y"] == 100
    assert out["width"] == 105 and out["height"] == 110
