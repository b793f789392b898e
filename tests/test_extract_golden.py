"""Golden span-sequence tests: the per-doc invariant (BASELINE.json:14).

Equality is checked on the ordered tuple sequence (kind, text, media_ref,
order) — order-sensitive, exactly the driver's invariant.
"""

import json

import pytest

import fixture_docs as FX
from docling_service_spark.engine.extract import extract_document
from docling_service_spark.engine.geometry import MediaRefError
from docling_service_spark.hashing import xxh64_hexdigest


def seq(result):
    return [(s["kind"], s["text"], s["media_ref"]) for s in result["spans"]]


def test_doc_report_golden_sequence():
    r = extract_document(FX.DOC_REPORT["doc_id"], FX.DOC_REPORT["spans"])
    assert r["status"] == "completed"
    assert seq(r) == FX.GOLDEN_REPORT_SPANS
    # offsets are the 0-based output ordinal
    assert [s["offset"] for s in r["spans"]] == list(range(len(FX.GOLDEN_REPORT_SPANS)))


def test_doc_report_metadata():
    r = extract_document(FX.DOC_REPORT["doc_id"], FX.DOC_REPORT["spans"])
    assert [t["id"] for t in r["tables"]] == ["table-1", "table-2", "table-3"]
    assert [(t["num_rows"], t["num_cols"]) for t in r["tables"]] == [(8, 5), (6, 6), (6, 7)]
    assert r["tables"][0]["caption"] == "Financial Summary"
    assert r["tables"][1]["caption"] is None
    assert [i["id"] for i in r["images"]] == ["picture-1"]
    img = r["images"][0]
    assert img["content_hash"] == xxh64_hexdigest(b"grid-image-1")
    assert img["page"] == 1 and img["coord_origin"] == "TOPLEFT"
    assert img["x_norm"] == round(156.0 / FX.PW, 4)
    assert img["y_norm"] == round(430.0 / FX.PH, 4)
    assert r["pages"] == [
        {"page": 1, "width": FX.PW, "height": FX.PH},
        {"page": 2, "width": FX.PW, "height": FX.PH},
    ]


def test_doc_report_markdown_structure():
    r = extract_document(FX.DOC_REPORT["doc_id"], FX.DOC_REPORT["spans"])
    md = r["markdown"]
    assert md.index("<!-- Page 1 -->") < md.index("<!-- Page 2 -->")
    assert md.count("<!-- Page") == 2
    assert "<!-- DOCLING_METADATA_START -->" in md and "<!-- DOCLING_METADATA_END -->" in md
    block = md.split("```json\n", 1)[1].split("\n```", 1)[0]
    meta = json.loads(block)
    assert set(meta) == {"images", "tables", "pages", "metadata"}
    assert meta["metadata"]["total_pages"] == 2
    assert meta["metadata"]["total_images"] == 1
    assert meta["metadata"]["total_tables"] == 3
    assert meta["metadata"]["source_filename"] == "fixture-report"
    assert meta["images"][0]["position"]["coord_origin"] == "TOPLEFT"
    assert meta["pages"] == [
        {"page": 1, "width": FX.PW, "height": FX.PH},
        {"page": 2, "width": FX.PW, "height": FX.PH},
    ]


def test_filtered_images_ordinals_and_survivors():
    r = extract_document(FX.DOC_FILTERED["doc_id"], FX.DOC_FILTERED["spans"])
    # Ordinals count ALL images in reading order; filtered ones consume ids
    # but emit neither metadata nor spans (reference app/main.py:589-590, 707).
    assert [i["id"] for i in r["images"]] == FX.KEPT_IMAGE_IDS
    assert [i["content_hash"] for i in r["images"]] == [
        xxh64_hexdigest(k.encode()) for k in FX.KEPT_IMAGE_KEYS
    ]
    image_spans = [s for s in r["spans"] if s["kind"] == "image"]
    assert [s["media_ref"] for s in image_spans] == [
        f"images/{xxh64_hexdigest(k.encode())}.png" for k in FX.KEPT_IMAGE_KEYS
    ]


def test_coord_origin_invariance():
    tl = extract_document("same", FX.DOC_TOPLEFT["spans"])
    bl = extract_document("same", FX.DOC_BOTTOMLEFT["spans"])
    # Same logical layout → identical (kind, text, media_ref) sequence.
    assert seq(tl) == seq(bl)
    # Metadata positions keep native-origin values: y differs, x matches.
    assert tl["images"][0]["y"] == 200.0
    assert bl["images"][0]["y"] == FX.PH - 200.0
    assert tl["images"][0]["x"] == bl["images"][0]["x"]
    assert tl["images"][0]["coord_origin"] == "TOPLEFT"
    assert bl["images"][0]["coord_origin"] == "BOTTOMLEFT"


def test_cross_doc_dedup_same_media_ref():
    a = extract_document(FX.DOC_DEDUP_A["doc_id"], FX.DOC_DEDUP_A["spans"])
    b = extract_document(FX.DOC_DEDUP_B["doc_id"], FX.DOC_DEDUP_B["spans"])
    ref_a = [s for s in a["spans"] if s["kind"] == "image"][0]["media_ref"]
    ref_b = [s for s in b["spans"] if s["kind"] == "image"][0]["media_ref"]
    assert ref_a == ref_b == f"images/{xxh64_hexdigest(b'shared-logo-bytes')}.png"


def test_empty_pages_skipped_in_markers():
    r = extract_document(FX.DOC_EMPTY_PAGE["doc_id"], FX.DOC_EMPTY_PAGE["spans"])
    markers = [s["text"] for s in r["spans"] if s["kind"] == "page_marker"]
    assert markers == ["<!-- Page 2 -->"]  # pages 1 and 3 are empty → no markers
    assert len(r["pages"]) == 3


def test_all_pages_empty_fallback():
    r = extract_document(FX.DOC_ALL_PAGES_EMPTY["doc_id"], FX.DOC_ALL_PAGES_EMPTY["spans"])
    # Reference fallback (app/main.py:472-480): single Page 1 marker.
    assert seq(r) == [("page_marker", "<!-- Page 1 -->", "")]


def test_malformed_doc_raises():
    with pytest.raises(MediaRefError):
        extract_document(FX.DOC_MALFORMED["doc_id"], FX.DOC_MALFORMED["spans"])


def test_null_spans_raises():
    with pytest.raises(ValueError):
        extract_document("x", None)


def test_html_doc_no_markers():
    spans = [{"kind": "html", "offset": 0, "media_ref": "",
              "text": "<h1>Title Here</h1><p>" + "Real content sentence. " * 5 + "</p>"}]
    r = extract_document("h", spans)
    assert [s["kind"] for s in r["spans"]] == ["heading", "text"]  # no pages → no markers
    assert r["pages"] == []


def test_offset_is_dense_ordinal():
    for fx in FX.ALL_FIXTURES:
        if fx["doc_id"] == "fixture-malformed":
            continue
        r = extract_document(fx["doc_id"], fx["spans"])
        assert [s["offset"] for s in r["spans"]] == list(range(len(r["spans"])))


def test_two_column_reading_order():
    r = extract_document(FX.DOC_TWO_COLUMN["doc_id"], FX.DOC_TWO_COLUMN["spans"])
    assert [s["text"] for s in r["spans"]] == FX.GOLDEN_TWO_COLUMN_TEXTS


def test_single_column_page_not_affected_by_column_rule():
    r = extract_document(FX.DOC_LEFT_ONLY["doc_id"], FX.DOC_LEFT_ONLY["spans"])
    assert [s["text"] for s in r["spans"]] == FX.GOLDEN_LEFT_ONLY_TEXTS


# --- spreadsheet / slide families (round-2: reference whitelist parity) ----------

def test_workbook_golden_sequence():
    r = extract_document(FX.DOC_WORKBOOK["doc_id"], FX.DOC_WORKBOOK["spans"])
    assert r["status"] == "completed"
    assert seq(r) == FX.GOLDEN_WORKBOOK_SPANS
    assert [s["offset"] for s in r["spans"]] == list(range(len(FX.GOLDEN_WORKBOOK_SPANS)))


def test_workbook_table_metadata():
    r = extract_document(FX.DOC_WORKBOOK["doc_id"], FX.DOC_WORKBOOK["spans"])
    assert [t["id"] for t in r["tables"]] == ["table-1", "table-2"]
    assert [(t["num_rows"], t["num_cols"]) for t in r["tables"]] == [(3, 3), (4, 2)]
    # Sheets carry no geometry: zeroed box, no page dims, no page markers.
    assert r["tables"][0]["x"] == 0.0 and r["tables"][0]["width"] == 0.0
    assert r["pages"] == []
    assert "<!-- Page" not in r["markdown"]
    assert r["markdown"].startswith("## Sales")


def test_deck_golden_sequence():
    r = extract_document(FX.DOC_DECK["doc_id"], FX.DOC_DECK["spans"])
    assert r["status"] == "completed"
    assert seq(r) == FX.GOLDEN_DECK_SPANS


def test_deck_markdown_and_pages():
    r = extract_document(FX.DOC_DECK["doc_id"], FX.DOC_DECK["spans"])
    md = r["markdown"]
    assert md.index("<!-- Page 1 -->") < md.index("## Quarterly Review")
    assert "### Engineering All Hands" in md
    assert "- Throughput is up." in md
    assert r["pages"] == [
        {"page": 1, "width": FX.SLIDE_W, "height": FX.SLIDE_H},
        {"page": 2, "width": FX.SLIDE_W, "height": FX.SLIDE_H},
    ]


# --- flow family (.docx analog; round-3: last whitelist member) -------------------

def test_memo_golden_sequence():
    r = extract_document(FX.DOC_MEMO["doc_id"], FX.DOC_MEMO["spans"])
    assert r["status"] == "completed"
    assert seq(r) == FX.GOLDEN_MEMO_SPANS
    assert [s["offset"] for s in r["spans"]] == list(range(len(FX.GOLDEN_MEMO_SPANS)))


def test_memo_markdown_nesting_and_no_pages():
    r = extract_document(FX.DOC_MEMO["doc_id"], FX.DOC_MEMO["spans"])
    # Hand-derived golden: heading levels 1/2/3 and list depth indentation.
    assert r["markdown"].startswith(FX.GOLDEN_MEMO_MD_PREFIX)
    assert "### Appendix" in r["markdown"]
    assert "```\ndef rate(n, s):\n    return n / s\n```" in r["markdown"]
    # No geometry: no pages, no markers; inline table metadata is zero-box.
    assert r["pages"] == []
    assert "<!-- Page" not in r["markdown"]
    assert [(t["num_rows"], t["num_cols"], t["caption"]) for t in r["tables"]] \
        == [(3, 3, "Latency")]
    assert r["tables"][0]["x"] == 0.0 and r["tables"][0]["width"] == 0.0


def test_flow_malformed_refs_fail():
    bad = [
        {"kind": "flow_block", "text": "x", "media_ref": "block=0,banner,0", "offset": 0},
        {"kind": "flow_block", "text": "x", "media_ref": "block=0,heading,7", "offset": 0},
        {"kind": "flow_block", "text": "x", "media_ref": "block=0,para,1", "offset": 0},
        {"kind": "flow_block", "text": "x", "media_ref": "block=-1,para,0", "offset": 0},
        {"kind": "flow_block", "text": "not json", "media_ref": "block=0,table,0", "offset": 0},
        {"kind": "flow_block", "text": "x", "media_ref": "slide=1,0,para", "offset": 0},
    ]
    for span in bad:
        with pytest.raises(MediaRefError):
            extract_document("d", [span])


def test_sheet_and_slide_malformed_refs_fail():
    bad_sheet = {"kind": "sheet_grid", "text": "{not json", "media_ref": "sheet=1", "offset": 0}
    with pytest.raises(MediaRefError):
        extract_document("d", [bad_sheet])
    bad_ref = {"kind": "sheet_grid", "text": "{}", "media_ref": "tab=1", "offset": 0}
    with pytest.raises(MediaRefError):
        extract_document("d", [bad_ref])
    bad_role = {"kind": "slide_block", "text": "x", "media_ref": "slide=1,0,shout", "offset": 0}
    with pytest.raises(MediaRefError):
        extract_document("d", [bad_role])
