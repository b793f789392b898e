"""Deterministic synthetic corpus of interleaved-span documents.

Six document families covering the reference's whole upload whitelist
(``app/main.py:1072-1079``: .pdf/.docx/.xlsx/.pptx plus the HTML ingest
path): HTML-like (boilerplate + main content), PDF-like (positioned blocks,
tables, images — content plan modeled on the reference's golden generator
``test_pdf_generator.py:71-219``), mixed, spreadsheet-like (sheets of cell
grids, no geometry), slide-like (placeholder-ordered slide blocks, one page
per slide), and word-processing-like (styled flowed blocks: heading
hierarchy, paragraphs, nested lists, inline tables — no geometry).
Generation is a pure function of ``(doc index, seed)`` so the corpus
can be materialized *inside Spark executors* (no driver-side collect) and is
identical at any partitioning — the property the repartition-invariance tests
rely on.

Positioned blocks are emitted in a *scrambled* input order on purpose: the
engine's reading-order reconstruction (geometry sort) must recover document
order, exactly as docling recovers reading order from layout.
"""

from __future__ import annotations

import json
import random
from typing import Optional

PAGE_W, PAGE_H = 612.0, 792.0  # US Letter in PDF points

_VOCAB = (
    "data span table page block layout column row header footer figure caption "
    "document corpus extract parse render margin anchor title body section text "
    "index offset batch arrow vector schema partition shuffle lineage snapshot"
).split()

_BOILER_LINKS = ["Home", "About", "Products", "Pricing", "Blog", "Careers", "Contact", "Login"]


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n))


def _sentence(rng: random.Random) -> str:
    s = _words(rng, rng.randint(8, 18))
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(3, 8)))


# ---------------------------------------------------------------------------
# HTML family
# ---------------------------------------------------------------------------

def _html_doc_spans(rng: random.Random, n_fragments: int) -> list[dict]:
    spans = []
    for frag_i in range(n_fragments):
        nav = "<nav><ul>" + "".join(f'<li><a href="/{x.lower()}">{x}</a></li>' for x in _BOILER_LINKS) + "</ul></nav>"
        sidebar = (
            '<div class="sidebar"><p>'
            + " ".join(f'<a href="/p/{i}">{_words(rng, 2)}</a>' for i in range(6))
            + "</p></div>"
        )
        ad = '<div id="ad-banner"><p>Buy now! <a href="/buy">Click here</a> limited offer!!!</p></div>'
        # Realistic page weight: ~15-40 content blocks, tens of KB of markup
        # per fragment — per-doc classify cost must dominate the fixed row
        # overheads, as it does for real web pages.
        title = _words(rng, rng.randint(3, 6)).title()
        body = [f"<h1>{title}</h1>"]
        body += [f"<p>{_paragraph(rng)}</p>" for _ in range(rng.randint(3, 6))]
        for _ in range(rng.randint(2, 4)):
            body.append(f"<h2>{_words(rng, 3).title()}</h2>")
            body += [f"<p>{_paragraph(rng)}</p>" for _ in range(rng.randint(4, 9))]
            body.append("<ul>" + "".join(f"<li>{_sentence(rng)}</li>"
                                         for _ in range(rng.randint(3, 7))) + "</ul>")
        if rng.random() < 0.4:
            body.append(f"<pre>def f_{frag_i}(x):\n    return x + {frag_i}</pre>")
        footer = (
            "<footer><p>Copyright 2026 · <a href='/terms'>Terms</a> · "
            "<a href='/privacy'>Privacy</a> · <a href='/imprint'>Imprint</a></p></footer>"
        )
        html = (
            f"<html><body>{nav}{sidebar}<article>{''.join(body)}</article>{ad}{footer}</body></html>"
        )
        spans.append({"kind": "html", "text": html, "media_ref": "", "offset": 0})
    return spans


# ---------------------------------------------------------------------------
# PDF-like family (positioned blocks; content plan per test_pdf_generator.py)
# ---------------------------------------------------------------------------

def _geom(page: int, x: float, y_top_from_top: float, w: float, h: float, origin: str) -> str:
    """Encode a box whose top edge is ``y_top_from_top`` points from page top."""
    if origin == "TOPLEFT":
        y = y_top_from_top
    else:  # BOTTOMLEFT: top edge measured from the bottom
        y = PAGE_H - y_top_from_top
    return f"{page},{x},{y},{w},{h},{origin}"


def _two_column_page(rng: random.Random, page: int, origin: str) -> list[dict]:
    """A two-column page: spanning heading, L/R column paragraphs, closing
    full-width block — exercises the column-aware reading order."""
    spans = [{"kind": "text_block", "text": _words(rng, 4).title(),
              "media_ref": _geom(page, 72.0, 40.0, 460.0, 24.0, origin) + ",heading", "offset": 0}]
    y_l = y_r = 90.0
    for _ in range(rng.randint(2, 5)):
        spans.append({"kind": "text_block", "text": _sentence(rng),
                      "media_ref": _geom(page, 50.0, y_l, 230.0, 40.0, origin) + ",text", "offset": 0})
        y_l += 55.0
    for _ in range(rng.randint(2, 5)):
        spans.append({"kind": "text_block", "text": _sentence(rng),
                      "media_ref": _geom(page, 330.0, y_r, 230.0, 40.0, origin) + ",text", "offset": 0})
        y_r += 55.0
    spans.append({"kind": "text_block", "text": _sentence(rng),
                  "media_ref": _geom(page, 72.0, max(y_l, y_r) + 30.0, 460.0, 20.0, origin) + ",text",
                  "offset": 0})
    return spans


def _pdf_doc_blocks(rng: random.Random, n_pages: int, blocks_per_page: int) -> list[dict]:
    """Unordered positioned spans (offset assigned later, scrambled)."""
    spans = [
        {"kind": "page_dims", "text": "", "media_ref": f"{p},{PAGE_W},{PAGE_H}", "offset": 0}
        for p in range(1, n_pages + 1)
    ]
    for page in range(1, n_pages + 1):
        if rng.random() < 0.15:  # ~15% of pages are two-column layouts
            spans += _two_column_page(page=page, rng=rng, origin=rng.choice(["TOPLEFT", "BOTTOMLEFT"]))
            continue
        origin = rng.choice(["TOPLEFT", "BOTTOMLEFT"])
        y = 60.0
        for bi in range(blocks_per_page):
            x = 72.0 + (bi % 2) * 6.0
            r = rng.random()
            if bi == 0:
                role = "heading" if page == 1 else "text"
                text = _words(rng, 4).title() if role == "heading" else _sentence(rng)
                h = 24.0
                spans.append({"kind": "text_block", "text": text,
                              "media_ref": _geom(page, x, y, 400.0, h, origin) + f",{role}", "offset": 0})
            elif r < 0.12:
                cells = [[_words(rng, 1) for _ in range(4)]] + [
                    [str(rng.randint(0, 999)) for _ in range(4)] for _ in range(rng.randint(2, 5))
                ]
                payload = json.dumps(
                    {"caption": _words(rng, 3).title() if rng.random() < 0.5 else None, "cells": cells},
                    sort_keys=True,
                )
                h = 18.0 * len(cells)
                spans.append({"kind": "table_block", "text": payload,
                              "media_ref": _geom(page, x, y, 440.0, h, origin), "offset": 0})
            elif r < 0.30:
                # Image: mixture of kept and filtered (small px / zone / tiny area).
                variant = rng.random()
                if variant < 0.2:
                    px_w, px_h, w, h, y_img = 30, 30, 120.0, 90.0, y  # filter 1
                elif variant < 0.35:
                    px_w, px_h, w, h = 300, 200, 200.0, 20.0  # filter 2: footer zone
                    y_img = PAGE_H - 25.0
                elif variant < 0.5:
                    px_w, px_h, w, h, y_img = 300, 200, 40.0, 30.0, y  # filter 3: tiny area
                else:
                    px_w, px_h, w, h, y_img = 300, 200, 240.0, 160.0, y  # kept
                key = f"img-{rng.randint(0, 500)}"  # small keyspace → cross-doc dedup
                alt = _words(rng, 2)
                spans.append({"kind": "image", "text": alt,
                              "media_ref": _geom(page, x, y_img, w, h, origin) + f",{px_w},{px_h},{key}",
                              "offset": 0})
                h = max(h, 20.0)
            else:
                role = rng.choice(["text", "text", "text", "list_item", "code", "caption"])
                text = _sentence(rng) if role != "code" else f"x = {rng.randint(0, 99)}"
                h = 20.0
                spans.append({"kind": "text_block", "text": text,
                              "media_ref": _geom(page, x, y, 430.0, h, origin) + f",{role}", "offset": 0})
            y += h + 8.0
            if y > PAGE_H - 80.0:
                break
    return spans


# ---------------------------------------------------------------------------
# Spreadsheet family (.xlsx analog: sheets of cell grids, no geometry)
# ---------------------------------------------------------------------------

def _sheet_doc_spans(rng: random.Random, n_sheets: int) -> list[dict]:
    spans = []
    for s in range(1, n_sheets + 1):
        n_rows = rng.randint(3, 8)
        n_cols = rng.randint(2, 5)
        header = [_words(rng, 1) for _ in range(n_cols)]
        cells = [header] + [
            [str(rng.randint(0, 9999)) for _ in range(n_cols)] for _ in range(n_rows)
        ]
        payload = json.dumps({"name": _words(rng, 2).title(), "cells": cells}, sort_keys=True)
        spans.append({"kind": "sheet_grid", "text": payload,
                      "media_ref": f"sheet={s}", "offset": 0})
    return spans


# ---------------------------------------------------------------------------
# Slide family (.pptx analog: slides are pages, placeholder-ordered blocks)
# ---------------------------------------------------------------------------

SLIDE_W, SLIDE_H = 720.0, 540.0  # 10x7.5in at 72dpi, the default pptx canvas


def _slide_doc_spans(rng: random.Random, n_slides: int) -> list[dict]:
    spans = [
        {"kind": "page_dims", "text": "", "media_ref": f"{s},{SLIDE_W},{SLIDE_H}", "offset": 0}
        for s in range(1, n_slides + 1)
    ]
    for s in range(1, n_slides + 1):
        order = 0
        spans.append({"kind": "slide_block", "text": _words(rng, 4).title(),
                      "media_ref": f"slide={s},{order},title", "offset": 0})
        order += 1
        if rng.random() < 0.3:
            spans.append({"kind": "slide_block", "text": _words(rng, 5).title(),
                          "media_ref": f"slide={s},{order},subtitle", "offset": 0})
            order += 1
        for _ in range(rng.randint(2, 6)):
            spans.append({"kind": "slide_block", "text": _sentence(rng),
                          "media_ref": f"slide={s},{order},bullet", "offset": 0})
            order += 1
        if rng.random() < 0.4:
            spans.append({"kind": "slide_block", "text": _paragraph(rng),
                          "media_ref": f"slide={s},{order},notes", "offset": 0})
    return spans


# ---------------------------------------------------------------------------
# Flow family (.docx analog: styled blocks in document order, no geometry)
# ---------------------------------------------------------------------------


def _flow_doc_spans(rng: random.Random, n_sections: int) -> list[dict]:
    """Word-processing document: heading hierarchy (title + h2/h3 sections),
    flowed paragraphs, nested list runs, inline tables, occasional code —
    ``block={order},{role},{level}`` refs carry the flow order; reading
    order must be recovered from it (input order is scrambled later)."""
    spans = []
    order = 0

    def emit(role: str, text: str, level: int = 0):
        nonlocal order
        spans.append({"kind": "flow_block", "text": text,
                      "media_ref": f"block={order},{role},{level}", "offset": 0})
        order += 1

    emit("heading", _words(rng, rng.randint(3, 6)).title(), 1)
    emit("para", _paragraph(rng))
    for _ in range(n_sections):
        emit("heading", _words(rng, 3).title(), 2)
        for _ in range(rng.randint(1, 3)):
            emit("para", _paragraph(rng))
        if rng.random() < 0.5:  # h3 subsection
            emit("heading", _words(rng, 2).title(), 3)
            emit("para", _paragraph(rng))
        if rng.random() < 0.7:  # nested list run: depth walks 0..2
            depth = 0
            for _ in range(rng.randint(2, 6)):
                emit("list", _sentence(rng), depth)
                depth = max(0, min(2, depth + rng.choice([-1, 0, 1, 1])))
        if rng.random() < 0.35:  # inline table (no geometry)
            n_cols = rng.randint(2, 4)
            cells = [[_words(rng, 1) for _ in range(n_cols)]] + [
                [str(rng.randint(0, 999)) for _ in range(n_cols)]
                for _ in range(rng.randint(1, 4))
            ]
            payload = json.dumps(
                {"caption": _words(rng, 3).title() if rng.random() < 0.4 else None,
                 "cells": cells},
                sort_keys=True,
            )
            emit("table", payload)
        if rng.random() < 0.25:
            emit("code", f"def s_{order}(v):\n    return v * {rng.randint(2, 9)}")
    return spans


# ---------------------------------------------------------------------------
# Public corpus API
# ---------------------------------------------------------------------------

N_FAMILIES = 6
_FAMILY_EXT = [".html", ".pdf", ".pdf", ".xlsx", ".pptx", ".docx"]  # idx % 6 families


def source_meta(idx: int, doc_id: str) -> dict:
    """Deterministic ingestion metadata (reference ConversionSource,
    app/main.py:44-51): every 4th doc arrives by URL, the rest are uploads
    with an original filename.  The extension follows the doc's FAMILY
    (idx % N_FAMILIES), so filename/URL never contradicts the content."""
    ext = _FAMILY_EXT[idx % N_FAMILIES]
    if idx % 4 == 0:
        return {"kind": "url", "value": f"https://example.org/docs/{idx}{ext}",
                "original_name": None}
    return {"kind": "upload", "value": f"{doc_id}{ext}",
            "original_name": f"report-{idx}{ext}"}


def build_doc(idx: int, seed: int = 42, *,
              oversize_every: int = 97, oversize_factor: int = 40,
              oversize_first: Optional[int] = None,
              malformed_every: Optional[int] = 211,
              include_source: bool = False) -> dict:
    """Build document ``idx`` deterministically.  Returns {doc_id, spans}
    (plus ``source`` when ``include_source``).

    ``oversize_first=K`` overrides the spread-out oversize rule with a
    CLUSTERED one (idx < K): because ``spark.range`` splits contiguously,
    every giant lands in the first partition(s) — the pathological
    heavy-tail layout the salted repartition exists for (bench.py skew
    section; tests/test_skew.py)."""
    rng = random.Random(f"{seed}:{idx}")
    doc_id = f"doc-{seed}-{idx:08d}"
    family = idx % N_FAMILIES
    if oversize_first is not None:
        oversized = idx < oversize_first
    else:
        oversized = oversize_every and idx > 0 and idx % oversize_every == 0
    scale = oversize_factor if oversized else 1

    if malformed_every and idx > 0 and idx % malformed_every == 0:
        spans = [
            {"kind": "text_block", "text": "ok", "media_ref": "1,72,700,100,20,TOPLEFT,text", "offset": 0},
            {"kind": "image", "text": "bad", "media_ref": "not,a,valid,ref", "offset": 1},
        ]
        doc = {"doc_id": doc_id, "spans": spans}
        if include_source:
            doc["source"] = source_meta(idx, doc_id)
        return doc

    if family == 0:
        spans = _html_doc_spans(rng, n_fragments=max(1, scale // 4) if oversized else 1)
    elif family == 1:
        spans = _pdf_doc_blocks(rng, n_pages=rng.randint(2, 6) * scale, blocks_per_page=rng.randint(18, 30))
    elif family == 2:
        spans = _pdf_doc_blocks(rng, n_pages=max(2, scale), blocks_per_page=rng.randint(12, 24))
        spans += _html_doc_spans(rng, n_fragments=1)
    elif family == 3:
        spans = _sheet_doc_spans(rng, n_sheets=rng.randint(1, 4) * scale)
    elif family == 4:
        spans = _slide_doc_spans(rng, n_slides=rng.randint(4, 12) * scale)
    else:
        spans = _flow_doc_spans(rng, n_sections=rng.randint(2, 6) * scale)

    # Scramble input order (page_dims first to keep parsing simple), then
    # assign strictly increasing offsets — reading order must be recovered
    # from geometry, not input order.
    dims = [s for s in spans if s["kind"] == "page_dims"]
    rest = [s for s in spans if s["kind"] != "page_dims"]
    rng.shuffle(rest)
    ordered = dims + rest
    for i, s in enumerate(ordered):
        s["offset"] = i
    doc = {"doc_id": doc_id, "spans": ordered}
    if include_source:
        doc["source"] = source_meta(idx, doc_id)
    return doc


def make_corpus(n_docs: int, seed: int = 42, **kwargs) -> list[dict]:
    """Driver-side corpus (tests / small fixtures)."""
    return [build_doc(i, seed, **kwargs) for i in range(n_docs)]


def corpus_df(spark, n_docs: int, seed: int = 42, partitions: Optional[int] = None,
              include_malformed: bool = True, include_source: bool = False,
              oversize_first: Optional[int] = None,
              oversize_factor: int = 40):
    """Distributed corpus: generated inside executors via mapInArrow.

    ``spark.range`` scales to any n_docs without driver materialization —
    at 10^12 ids this is the same pattern, just a bigger range.
    ``include_source`` adds the optional ingestion-metadata column (see
    source_meta); extra input columns flow through extraction untouched.
    """
    import pyarrow as pa

    from .schemas import INPUT_ARROW, SOURCE_ARROW

    malformed_every = 211 if include_malformed else None
    fields = list(INPUT_ARROW) + ([pa.field("source", SOURCE_ARROW)] if include_source else [])
    ddl = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    if include_source:
        ddl += ", source struct<kind:string,value:string,original_name:string>"

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_pylist()
            docs = [build_doc(i, seed, malformed_every=malformed_every,
                              include_source=include_source,
                              oversize_first=oversize_first,
                              oversize_factor=oversize_factor) for i in ids]
            yield pa.RecordBatch.from_pylist(docs, schema=pa.schema(fields))

    rng_df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInArrow(gen, ddl)
