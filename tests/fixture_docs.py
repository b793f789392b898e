"""Golden fixture documents (FIXTURES.md §4) with hand-derived expectations.

``doc_report`` mirrors the content plan of the reference's golden generator
(``test_pdf_generator.py:71-219``): title, intro, 8x5 table, 6x6 table, one
300x200 image, bullets, page break, 6x7 table, code block, footer.

Spans are emitted in a scrambled input order on purpose; the golden sequence
is derived from the documented reading-order rule (page, y-from-top, x).
"""

from __future__ import annotations

import json

from docling_service_spark.hashing import xxh64_hexdigest

PW, PH = 612.0, 792.0


def _tb(page, x, y_tft, w, h, role, text, origin="TOPLEFT"):
    y = y_tft if origin == "TOPLEFT" else PH - y_tft
    return {"kind": "text_block", "text": text,
            "media_ref": f"{page},{x},{y},{w},{h},{origin},{role}", "offset": 0}


def _table(page, x, y_tft, w, h, cells, caption=None, origin="TOPLEFT"):
    y = y_tft if origin == "TOPLEFT" else PH - y_tft
    return {"kind": "table_block",
            "text": json.dumps({"caption": caption, "cells": cells}, sort_keys=True),
            "media_ref": f"{page},{x},{y},{w},{h},{origin}", "offset": 0}


def _img(page, x, y_tft, w, h, px_w, px_h, key, alt="", origin="TOPLEFT"):
    y = y_tft if origin == "TOPLEFT" else PH - y_tft
    return {"kind": "image", "text": alt,
            "media_ref": f"{page},{x},{y},{w},{h},{origin},{px_w},{px_h},{key}", "offset": 0}


def _dims(page):
    return {"kind": "page_dims", "text": "", "media_ref": f"{page},{PW},{PH}", "offset": 0}


def md_table(cells):
    """Independent hand-rolled oracle for table markdown."""
    out = ["| " + " | ".join(str(c) for c in cells[0]) + " |",
           "|" + "|".join(["---"] * len(cells[0])) + "|"]
    for row in cells[1:]:
        out.append("| " + " | ".join(str(c) for c in row) + " |")
    return "\n".join(out)


# --- doc_report ---------------------------------------------------------------

T1 = [[f"r{r}c{c}" for c in range(5)] for r in range(8)]      # 8x5
T2 = [[f"q{r}{c}" for c in range(6)] for r in range(6)]       # 6x6
T3 = [[f"p{r}{c}" for c in range(7)] for r in range(6)]       # 6x7
IMG_KEY = "grid-image-1"
IMG_REF = f"images/{xxh64_hexdigest(IMG_KEY.encode())}.png"

_REPORT_BLOCKS = [
    _dims(1), _dims(2),
    _tb(1, 72, 50, 400, 24, "heading", "Annual Financial Report"),
    _tb(1, 72, 90, 430, 20, "text", "This report summarizes the fiscal year."),
    _table(1, 72, 130, 440, 150, T1, caption="Financial Summary"),
    _table(1, 72, 300, 440, 110, T2),
    _img(1, 156, 430, 300.0, 160.0, 300, 200, IMG_KEY, alt="Data grid"),
    _tb(1, 72, 640, 430, 16, "list_item", "Feature one is fast."),
    _tb(1, 72, 660, 430, 16, "list_item", "Feature two is safe."),
    _tb(1, 72, 680, 430, 16, "list_item", "Feature three scales."),
    _tb(2, 72, 60, 440, 120, "text", "Performance metrics for the period follow."),
    _table(2, 72, 200, 440, 110, T3, caption="Performance"),
    _tb(2, 72, 340, 430, 60, "code", "def roi(x):\n    return x * 1.07"),
    _tb(2, 72, 700, 430, 16, "text", "Confidential - internal use only."),
]

# Scrambled input order (fixed permutation), page_dims first.
_PERM = [0, 1, 9, 4, 12, 2, 7, 13, 5, 10, 3, 8, 6, 11]
DOC_REPORT = {
    "doc_id": "fixture-report",
    "spans": [dict(_REPORT_BLOCKS[i], offset=n) for n, i in enumerate(_PERM)],
}

GOLDEN_REPORT_SPANS = [
    ("page_marker", "<!-- Page 1 -->", ""),
    ("heading", "Annual Financial Report", ""),
    ("text", "This report summarizes the fiscal year.", ""),
    ("table", md_table(T1), ""),
    ("table", md_table(T2), ""),
    ("image", "Data grid", IMG_REF),
    ("list_item", "Feature one is fast.", ""),
    ("list_item", "Feature two is safe.", ""),
    ("list_item", "Feature three scales.", ""),
    ("page_marker", "<!-- Page 2 -->", ""),
    ("text", "Performance metrics for the period follow.", ""),
    ("table", md_table(T3), ""),
    ("code", "def roi(x):\n    return x * 1.07", ""),
    ("text", "Confidential - internal use only.", ""),
]

# --- doc_filtered_images --------------------------------------------------------

_FILT_BLOCKS = [
    _dims(1),
    _tb(1, 72, 40, 400, 20, "text", "Images below exercise every filter boundary."),
    _img(1, 72, 80, 240, 160, 49, 50, "too-narrow"),          # f1 skip (picture-1)
    _img(1, 72, 100, 240, 160, 50, 49, "too-short"),          # f1 skip (picture-2)
    _img(1, 72, 120, 240, 160, 50, 50, "exactly-50"),         # kept   (picture-3)
    _img(1, 72, 760, 100, 20, 300, 200, "footer-inside"),     # f2 skip (picture-4)
    _img(1, 72, 745, 100, 40, 300, 200, "footer-straddle"),   # kept   (picture-5)
    _img(1, 72, 5, 300, 20, 300, 200, "header-inside"),       # f2 skip (picture-6)
    _img(1, 72, 300, 100, 25, 300, 200, "area-2500"),         # kept   (picture-7)
    _img(1, 72, 360, 100, 24, 300, 200, "area-2400"),         # f3 skip (picture-8)
]
DOC_FILTERED = {
    "doc_id": "fixture-filtered",
    "spans": [dict(b, offset=i) for i, b in enumerate(_FILT_BLOCKS)],
}
# Ordinals are assigned in READING order (sorted by y-from-top), counting
# filtered images too: header-inside(1) < too-narrow(2) < too-short(3) <
# exactly-50(4) < area-2500(5) < area-2400(6) < footer-straddle(7) <
# footer-inside(8).
KEPT_IMAGE_IDS = ["picture-4", "picture-5", "picture-7"]
KEPT_IMAGE_KEYS = ["exactly-50", "area-2500", "footer-straddle"]


# --- doc_coord_origins ----------------------------------------------------------

def _origin_doc(origin: str, doc_id: str) -> dict:
    blocks = [
        _dims(1),
        _tb(1, 72, 50, 400, 24, "heading", "Origins", origin=origin),
        _tb(1, 72, 100, 400, 20, "text", "Same layout in either origin.", origin=origin),
        _img(1, 156, 200, 240, 160, 300, 200, "origin-img", alt="pic", origin=origin),
        _tb(1, 72, 400, 400, 20, "text", "Tail block.", origin=origin),
    ]
    perm = [0, 3, 1, 4, 2]
    return {"doc_id": doc_id, "spans": [dict(blocks[i], offset=n) for n, i in enumerate(perm)]}


DOC_TOPLEFT = _origin_doc("TOPLEFT", "fixture-topleft")
DOC_BOTTOMLEFT = _origin_doc("BOTTOMLEFT", "fixture-bottomleft")

# --- doc_dedup -------------------------------------------------------------------

def _dedup_doc(doc_id: str) -> dict:
    blocks = [
        _dims(1),
        _tb(1, 72, 50, 400, 20, "text", f"Host document {doc_id}."),
        _img(1, 72, 100, 240, 160, 300, 200, "shared-logo-bytes", alt="logo"),
    ]
    return {"doc_id": doc_id, "spans": [dict(b, offset=i) for i, b in enumerate(blocks)]}


DOC_DEDUP_A = _dedup_doc("fixture-dedup-a")
DOC_DEDUP_B = _dedup_doc("fixture-dedup-b")

# --- doc_empty_page / doc_malformed ----------------------------------------------

DOC_EMPTY_PAGE = {
    "doc_id": "fixture-empty-page",
    "spans": [dict(b, offset=i) for i, b in enumerate([
        _dims(1), _dims(2), _dims(3),
        _tb(2, 72, 100, 400, 20, "text", "Only page two has content."),
    ])],
}

DOC_ALL_PAGES_EMPTY = {
    "doc_id": "fixture-all-empty",
    "spans": [dict(b, offset=i) for i, b in enumerate([_dims(1), _dims(2)])],
}

DOC_MALFORMED = {
    "doc_id": "fixture-malformed",
    "spans": [
        {"kind": "text_block", "text": "ok", "media_ref": "1,72,700,100,20,TOPLEFT,text", "offset": 0},
        {"kind": "image", "text": "bad", "media_ref": "not,a,valid,ref", "offset": 1},
    ],
}

ALL_FIXTURES = [
    DOC_REPORT, DOC_FILTERED, DOC_TOPLEFT, DOC_BOTTOMLEFT,
    DOC_DEDUP_A, DOC_DEDUP_B, DOC_EMPTY_PAGE, DOC_ALL_PAGES_EMPTY, DOC_MALFORMED,
]


# --- doc_two_column ---------------------------------------------------------------
# Page midline = 306; tol = 12.24. Left column: x+w <= 318.24; right: x >= 293.76.

_2COL_BLOCKS = [
    _dims(1),
    _tb(1, 72, 40, 460, 24, "heading", "Spanning Title"),          # F (crosses middle)
    _tb(1, 50, 100, 230, 20, "text", "Left column first paragraph."),   # L
    _tb(1, 50, 200, 230, 20, "text", "Left column second paragraph."),  # L
    _tb(1, 330, 120, 230, 20, "text", "Right column first paragraph."), # R
    _tb(1, 330, 180, 230, 20, "text", "Right column second paragraph."),# R
    _tb(1, 72, 600, 460, 20, "text", "Full-width closing paragraph."),  # F
]
_2COL_PERM = [0, 4, 2, 6, 1, 5, 3]
DOC_TWO_COLUMN = {
    "doc_id": "fixture-two-column",
    "spans": [dict(_2COL_BLOCKS[i], offset=n) for n, i in enumerate(_2COL_PERM)],
}

GOLDEN_TWO_COLUMN_TEXTS = [
    "<!-- Page 1 -->",
    "Spanning Title",                    # F above → opens
    "Left column first paragraph.",      # L top-to-bottom
    "Left column second paragraph.",
    "Right column first paragraph.",     # then R top-to-bottom
    "Right column second paragraph.",
    "Full-width closing paragraph.",     # F below → closes
]

# Same blocks but with the right column removed → single-column mode:
# pure y-order applies (no column grouping).
DOC_LEFT_ONLY = {
    "doc_id": "fixture-left-only",
    "spans": [dict(b, offset=i) for i, b in enumerate(
        [_2COL_BLOCKS[0], _2COL_BLOCKS[1], _2COL_BLOCKS[2], _2COL_BLOCKS[3], _2COL_BLOCKS[6]])],
}
GOLDEN_LEFT_ONLY_TEXTS = [
    "<!-- Page 1 -->",
    "Spanning Title",
    "Left column first paragraph.",
    "Left column second paragraph.",
    "Full-width closing paragraph.",
]


# --- doc_workbook (spreadsheet family: sheet_grid spans) -------------------------

S1 = [["region", "units", "revenue"],
      ["north", "120", "2400"],
      ["south", "80", "1600"]]
S2 = [["quarter", "margin"],
      ["Q1", "0.31"],
      ["Q2", "0.28"],
      ["Q3", "0.35"]]

_WB_BLOCKS = [
    {"kind": "sheet_grid", "media_ref": "sheet=1", "offset": 0,
     "text": json.dumps({"name": "Sales", "cells": S1}, sort_keys=True)},
    {"kind": "sheet_grid", "media_ref": "sheet=2", "offset": 0,
     "text": json.dumps({"name": "Margins", "cells": S2}, sort_keys=True)},
]
# Scrambled: sheet 2 arrives first — reading order must recover sheet order.
DOC_WORKBOOK = {
    "doc_id": "fixture-workbook",
    "spans": [dict(_WB_BLOCKS[i], offset=n) for n, i in enumerate([1, 0])],
}

# No page_dims → no page markers; each sheet renders name-heading then grid.
GOLDEN_WORKBOOK_SPANS = [
    ("heading", "Sales", ""),
    ("table", md_table(S1), ""),
    ("heading", "Margins", ""),
    ("table", md_table(S2), ""),
]


# --- doc_deck (slide family: slide_block spans, one page per slide) --------------

SLIDE_W, SLIDE_H = 720.0, 540.0


def _slide(n, order, role, text):
    return {"kind": "slide_block", "text": text,
            "media_ref": f"slide={n},{order},{role}", "offset": 0}


_DECK_BLOCKS = [
    {"kind": "page_dims", "text": "", "media_ref": f"1,{SLIDE_W},{SLIDE_H}", "offset": 0},
    {"kind": "page_dims", "text": "", "media_ref": f"2,{SLIDE_W},{SLIDE_H}", "offset": 0},
    _slide(1, 0, "title", "Quarterly Review"),
    _slide(1, 1, "subtitle", "Engineering All Hands"),
    _slide(1, 2, "bullet", "Throughput is up."),
    _slide(1, 3, "bullet", "Latency is down."),
    _slide(2, 0, "title", "Roadmap"),
    _slide(2, 1, "bullet", "Ship the new engine."),
    _slide(2, 2, "notes", "Speaker notes: keep this slide short."),
]
_DECK_PERM = [0, 1, 6, 3, 8, 2, 5, 7, 4]
DOC_DECK = {
    "doc_id": "fixture-deck",
    "spans": [dict(_DECK_BLOCKS[i], offset=n) for n, i in enumerate(_DECK_PERM)],
}

GOLDEN_DECK_SPANS = [
    ("page_marker", "<!-- Page 1 -->", ""),
    ("heading", "Quarterly Review", ""),
    ("heading", "Engineering All Hands", ""),
    ("list_item", "Throughput is up.", ""),
    ("list_item", "Latency is down.", ""),
    ("page_marker", "<!-- Page 2 -->", ""),
    ("heading", "Roadmap", ""),
    ("list_item", "Ship the new engine.", ""),
    ("text", "Speaker notes: keep this slide short.", ""),
]


# --- doc_memo (flow family: styled flowed blocks, .docx analog) -------------------

M_TABLE = [["metric", "before", "after"],
           ["p50 ms", "41", "12"],
           ["p99 ms", "480", "95"]]


def _flow(order, role, text, level=0):
    return {"kind": "flow_block", "text": text,
            "media_ref": f"block={order},{role},{level}", "offset": 0}


_MEMO_BLOCKS = [
    _flow(0, "heading", "Migration Memo", 1),
    _flow(1, "para", "This memo summarizes the engine migration."),
    _flow(2, "heading", "Findings", 2),
    _flow(3, "list", "Throughput improved.", 0),
    _flow(4, "list", "Batch path improved most.", 1),
    _flow(5, "list", "Arrow transfers dominate.", 2),
    _flow(6, "list", "Latency is flat.", 0),
    _flow(7, "heading", "Measurements", 2),
    _flow(8, "table", json.dumps({"caption": "Latency", "cells": M_TABLE},
                                 sort_keys=True)),
    _flow(9, "heading", "Appendix", 3),
    _flow(10, "code", "def rate(n, s):\n    return n / s"),
    _flow(11, "para", "End of memo."),
]
# Scrambled hard: reading order must be recovered from block order alone.
_MEMO_PERM = [7, 2, 11, 0, 5, 9, 3, 10, 1, 8, 6, 4]
DOC_MEMO = {
    "doc_id": "fixture-memo",
    "spans": [dict(_MEMO_BLOCKS[i], offset=n) for n, i in enumerate(_MEMO_PERM)],
}

# No geometry, no pages → no page markers; nesting shows in markdown only.
GOLDEN_MEMO_SPANS = [
    ("heading", "Migration Memo", ""),
    ("text", "This memo summarizes the engine migration.", ""),
    ("heading", "Findings", ""),
    ("list_item", "Throughput improved.", ""),
    ("list_item", "Batch path improved most.", ""),
    ("list_item", "Arrow transfers dominate.", ""),
    ("list_item", "Latency is flat.", ""),
    ("heading", "Measurements", ""),
    ("table", md_table(M_TABLE), ""),
    ("heading", "Appendix", ""),
    ("code", "def rate(n, s):\n    return n / s", ""),
    ("text", "End of memo.", ""),
]

GOLDEN_MEMO_MD_PREFIX = (
    "# Migration Memo\n\n"
    "This memo summarizes the engine migration.\n\n"
    "## Findings\n\n"
    "- Throughput improved.\n\n"
    "  - Batch path improved most.\n\n"
    "    - Arrow transfers dominate.\n\n"
    "- Latency is flat.\n\n"
    "## Measurements\n\n"
)

ALL_FIXTURES.append(DOC_MEMO)
