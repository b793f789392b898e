"""Per-document extraction: raw interleaved spans → ordered extraction result.

Pure function; no Spark imports.  This is the engine's analog of the
reference's ``_execute`` pipeline body (``app/main.py:300-336``):
convert → save/filter images → extract tables → page dims → page-marker
markdown → metadata block — collapsed into one deterministic pass over a
document's span list.

Determinism contract (north_rule): output depends only on ``(doc_id, spans)``,
never on partitioning, batch boundaries, wall clock, or iteration order of any
dict — so span-sequence equality holds across any cluster layout.

Reading order: blocks sort by ``(page, y_from_top, x, input_offset, intra)``.
Positioned blocks use their geometry; HTML-fragment blocks (no geometry) use
``y_from_top = input offset`` so fragments keep input order and interleave
deterministically in mixed documents.  This replaces docling's learned
reading-order model with an explicit rule (SURVEY.md §4 item 3).
"""

from __future__ import annotations

import json
from typing import Any, Optional

from json.encoder import encode_basestring_ascii as _esc

from ..hashing import media_key, xxh64_hexdigest
from . import geometry as G
from .fastjson import _enc as _json_enc, _float_repr
from .html_extract import extract_html_blocks

RAW_KINDS = frozenset(["html", "text_block", "table_block", "image", "page_dims", "page_break",
                       "sheet_grid", "slide_block", "flow_block"])
TEXT_ROLES = frozenset(["text", "heading", "list_item", "code", "caption"])

# Slide placeholder role → (output block kind, heading level).  Mirrors the
# reference's .pptx handling (whitelist app/main.py:1072-1079): docling maps
# slide titles to headings and body placeholders to list items.
SLIDE_ROLE_MAP = {
    "title": ("heading", 2),
    "subtitle": ("heading", 3),
    "bullet": ("list_item", 0),
    "notes": ("text", 0),
}


class _Block:
    __slots__ = ("sort_key", "kind", "text", "level", "box", "payload")

    def __init__(self, sort_key, kind, text="", level=0, box=None, payload=None):
        self.sort_key = sort_key
        self.kind = kind
        self.text = text
        self.level = level
        self.box = box
        self.payload = payload  # image: (px_w, px_h, content_key); table: cells/caption


def _parse_html_page(media_ref: str) -> int:
    if not media_ref:
        return 1
    if media_ref.startswith("page="):
        return int(media_ref[5:])
    raise G.MediaRefError(f"html media_ref must be '' or 'page=N': {media_ref!r}")


def _collect_blocks(kinds: list, texts: list, refs: list, offs: list,
                    pages: dict[int, tuple[float, float]]) -> list[_Block]:
    """Consumes the span sequence as PARALLEL COLUMNS (kind/text/media_ref/
    offset lists), not per-span dicts — the Arrow kernel feeds the struct
    children straight in (primitive ``to_pylist`` is C-fast; per-span dict
    materialization went through the Mapping-protocol StructScalar path and
    was the input side's dominant allocation, r4 verdict #1).  The dict-based
    public surface (``extract_document``) splits into columns up front."""
    # Pass 1: page declarations.  Done first so a block's reading-order key
    # never depends on whether its page_dims span precedes it in input order.
    for j, kind in enumerate(kinds):
        if kind == "page_dims":
            page, w, h = G.parse_page_dims(refs[j] or "")
            pages[page] = (w, h)

    blocks: list[_Block] = []
    for j, kind in enumerate(kinds):
        text = texts[j] or ""
        ref = refs[j] or ""
        off = offs[j]
        off = 0 if off is None else int(off)
        if kind == "page_dims":
            continue
        elif kind == "page_break":
            continue  # page structure is declared via page_dims
        elif kind == "html":
            page = _parse_html_page(ref)
            for j, (bkind, btext, blevel) in enumerate(extract_html_blocks(text)):
                blocks.append(_Block((page, float(off), 0.0, off, j), bkind, btext, blevel))
        elif kind == "text_block":
            box, role = G.parse_text_block_ref(ref)
            if role not in TEXT_ROLES:
                raise G.MediaRefError(f"unknown text_block role {role!r}")
            ph = pages.get(box.page, (None, None))[1]
            key = (box.page, G.y_from_top(box, ph), box.x, off, 0)
            level = 2 if role == "heading" else 0
            blocks.append(_Block(key, role, text, level, box))
        elif kind == "table_block":
            box = G.parse_table_block_ref(ref)
            try:
                payload = json.loads(text)
                cells = payload["cells"]
                caption = payload.get("caption")
            except (json.JSONDecodeError, TypeError, KeyError) as exc:
                raise G.MediaRefError(f"malformed table_block payload: {exc}") from exc
            ph = pages.get(box.page, (None, None))[1]
            key = (box.page, G.y_from_top(box, ph), box.x, off, 0)
            blocks.append(_Block(key, "table", "", 0, box, (cells, caption)))
        elif kind == "image":
            box, px_w, px_h, content_key = G.parse_image_ref(ref)
            ph = pages.get(box.page, (None, None))[1]
            key = (box.page, G.y_from_top(box, ph), box.x, off, 0)
            blocks.append(_Block(key, "image", text, 0, box, (px_w, px_h, content_key)))
        elif kind == "sheet_grid":
            # Spreadsheet family (.xlsx analog): each sheet is a logical page
            # holding a named grid-of-cells, routed through the same table
            # path as positioned PDF tables.  Sheets carry no geometry, so
            # the table box is zeroed and page dims stay undeclared (no page
            # markers in pure spreadsheet docs — matching a sheet-by-sheet
            # markdown rendering).
            sheet_no = G.parse_sheet_ref(ref)
            try:
                payload = json.loads(text)
                cells = payload["cells"]
                name = payload.get("name")
            except (json.JSONDecodeError, TypeError, KeyError) as exc:
                raise G.MediaRefError(f"malformed sheet_grid payload: {exc}") from exc
            if name:
                blocks.append(_Block((sheet_no, -1.0, 0.0, off, 0), "heading", str(name), 2))
            box = G.BBox(page=sheet_no, x=0.0, y=0.0, width=0.0, height=0.0,
                         coord_origin=G.TOPLEFT)
            blocks.append(_Block((sheet_no, 0.0, 0.0, off, 1), "table", "", 0, box,
                                 (cells, payload.get("caption"))))
        elif kind == "slide_block":
            # Slide family (.pptx analog): slides are pages; blocks order by
            # placeholder order within the slide, not free geometry.
            slide_no, order, role = G.parse_slide_ref(ref)
            out_kind, level = SLIDE_ROLE_MAP[role]
            blocks.append(_Block((slide_no, float(order), 0.0, off, 0), out_kind, text, level))
        elif kind == "flow_block":
            # Word-processing family (.docx analog, whitelist
            # app/main.py:1072-1079): styled blocks — heading hierarchy,
            # paragraphs, nested list items, inline tables — flow in
            # document order with NO geometry; pages stay undeclared until
            # pagination, so pure flow docs render without page markers
            # (same no-pages rule as spreadsheets).  All blocks sort on the
            # flow order within logical page 1.
            order, role, level = G.parse_flow_ref(ref)
            key = (1, float(order), 0.0, off, 0)
            if role == "table":
                try:
                    payload = json.loads(text)
                    cells = payload["cells"]
                    caption = payload.get("caption")
                except (json.JSONDecodeError, TypeError, KeyError) as exc:
                    raise G.MediaRefError(f"malformed flow table payload: {exc}") from exc
                box = G.BBox(page=1, x=0.0, y=0.0, width=0.0, height=0.0,
                             coord_origin=G.TOPLEFT)
                blocks.append(_Block(key, "table", "", 0, box, (cells, caption)))
            else:
                out_kind = {"heading": "heading", "para": "text",
                            "list": "list_item", "code": "code"}[role]
                blocks.append(_Block(key, out_kind, text, level))
        else:
            raise G.MediaRefError(f"unknown raw span kind {kind!r}")
    return blocks


def _apply_column_order(blocks: list[_Block], pages: dict[int, tuple[float, float]]) -> None:
    """Reading-order re-keying for two-column pages (SURVEY §2-A6: layout
    reading-order reconstruction).

    A page switches to column-wise order only when it contains blocks
    entirely in BOTH halves (evidence of a real two-column layout — the rule
    never engages on single-column pages, so their order is untouched).
    Full-width blocks partition the page into vertical segments; within a
    segment the left column reads top-to-bottom, then the right column.  A
    full-width block above columns (a spanning heading) precedes them; one
    below (a closing paragraph) follows them.  Two-column pages get keys
    ``(page, segment, column_rank, y, x, offset, intra)``; single-column
    pages keep their ORIGINAL ``(page, y, x, offset, intra)`` keys untouched
    — ordering is already correct there, and tuples only ever compare
    against same-page (hence same-shape) keys because ``page`` is the first
    element, so the per-block re-keying allocation (r4 verdict #1:
    allocation-bound kernel) is skipped for the common case.
    """
    from bisect import bisect_right
    from collections import defaultdict

    by_page: dict[int, list[_Block]] = defaultdict(list)
    for b in blocks:
        by_page[b.sort_key[0]].append(b)

    for page, blist in by_page.items():
        pw = pages.get(page, (None, None))[0]
        if not pw or pw <= 0:
            continue  # no declared width → every class is 'F' (no evidence)
        cls = [G.column_class(b.box, pw) for b in blist]
        if "L" not in cls or "R" not in cls:
            continue  # single-column page: order untouched
        f_blocks = sorted((b for b, c in zip(blist, cls) if c == "F"),
                          key=lambda b: b.sort_key[1:])
        f_index = {id(b): i for i, b in enumerate(f_blocks)}
        f_ys = [b.sort_key[1] for b in f_blocks]
        for b, c in zip(blist, cls):
            if c == "F":
                # seg = count of full-width blocks strictly above → a
                # spanning block closes the column segment above it.
                b.sort_key = (page, f_index[id(b)], 2) + b.sort_key[1:]
            else:
                seg = bisect_right(f_ys, b.sort_key[1])
                b.sort_key = (page, seg, 0 if c == "L" else 1) + b.sort_key[1:]


def _render_table(cells: list[list[Any]]) -> str:
    if not cells:
        return ""
    rows = [[("" if c is None else str(c)) for c in row] for row in cells]
    lines = ["| " + " | ".join(rows[0]) + " |"]
    lines.append("|" + "|".join("---" for _ in rows[0]) + "|")
    for row in rows[1:]:
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)


def _render_block(kind: str, text: str, level: int, media_ref: str) -> str:
    if kind == "heading":
        return "#" * max(level, 1) + " " + text
    if kind == "list_item":
        # level = nesting depth (flow docs); html/slide items are depth 0,
        # so their rendering is unchanged.
        return "  " * level + "- " + text
    if kind == "code":
        return f"```\n{text}\n```"
    if kind == "image":
        return f"![{text}]({media_ref})"
    if kind == "table":
        return text
    return text  # text, caption, page_marker handled elsewhere


# The markdown/metadata boundary — THE sentinel: consumers that strip the
# machine tail (training.py body extraction) import this instead of
# re-declaring the bytes, so renderer and strippers cannot drift.
META_BLOCK_PREFIX = "\n\n---\n\n<!-- DOCLING_METADATA_START -->"


def _metadata_obj(images: list[dict], tables: list[dict], pages_list: list[dict],
                  doc_meta: dict) -> dict:
    """REFERENCE implementation of the metadata structure (app/main.py:484-546)
    — kept as the differential-test oracle for the fused emitter below
    (``dumps_indent2(_metadata_obj(...)) == _metadata_json(...)`` byte-for-
    byte, tests/test_fastjson.py); the hot path never builds this dict."""
    return {
        "images": [
            {
                "id": img["id"],
                "page": img["page"],
                "position": {
                    "x": img["x"],
                    "y": img["y"],
                    "width": img["width"],
                    "height": img["height"],
                    "coord_origin": img["coord_origin"],
                    "x_norm": img["x_norm"],
                    "y_norm": img["y_norm"],
                    "width_norm": img["width_norm"],
                    "height_norm": img["height_norm"],
                },
                "page_dimensions": img["_page_dimensions"],
            }
            for img in images
        ],
        "tables": [
            {
                "id": tbl["id"],
                "page": tbl["page"],
                "position": {
                    "x": tbl["x"],
                    "y": tbl["y"],
                    "width": tbl["width"],
                    "height": tbl["height"],
                },
                "page_dimensions": tbl["_page_dimensions"],
                "num_rows": tbl["num_rows"],
                "num_cols": tbl["num_cols"],
            }
            for tbl in tables
        ],
        "pages": [
            {"page": i + 1, "width": pd["width"], "height": pd["height"]}
            for i, pd in enumerate(pages_list)
        ],
        "metadata": doc_meta,
    }


def _scalar(v) -> str:
    """One JSON leaf, matching dumps_indent2's value domain exactly."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    t = type(v)
    if t is str:
        return _esc(v)
    if t is int:
        return repr(v)
    if t is float:
        return _float_repr(v)
    raise TypeError(f"Object of type {t.__name__} is not JSON serializable")


def _pagedims_json(pd: Optional[dict], pad: str) -> str:
    """``pad`` is the nested dict's KEY indent; the brace closes one level up."""
    if pd is None:
        return "null"
    return (f'{{\n{pad}"width": {_scalar(pd["width"])},'
            f'\n{pad}"height": {_scalar(pd["height"])}\n{pad[:-2]}}}')


def _metadata_json(images: list[dict], tables: list[dict], pages_list: list[dict],
                   doc_meta: dict) -> str:
    """Schema-specialized emitter for the metadata block — byte-identical to
    ``dumps_indent2(_metadata_obj(...))`` (differential-tested) without
    building the intermediate dict tree or walking it recursively.  This is
    the kernel's single hottest allocation site (r4 verdict #1: the extract
    stage tracks the host's DRAM-streaming ceiling; fusing the build+encode
    passes cuts the per-doc dict/list churn the generic path pays)."""
    out = ['{\n  "images": [']
    for i, g in enumerate(images):
        out.append("\n    {" if i == 0 else ",\n    {")
        out.append(
            f'\n      "id": {_esc(g["id"])},'
            f'\n      "page": {_scalar(g["page"])},'
            '\n      "position": {'
            f'\n        "x": {_scalar(g["x"])},'
            f'\n        "y": {_scalar(g["y"])},'
            f'\n        "width": {_scalar(g["width"])},'
            f'\n        "height": {_scalar(g["height"])},'
            f'\n        "coord_origin": {_esc(g["coord_origin"])},'
            f'\n        "x_norm": {_scalar(g["x_norm"])},'
            f'\n        "y_norm": {_scalar(g["y_norm"])},'
            f'\n        "width_norm": {_scalar(g["width_norm"])},'
            f'\n        "height_norm": {_scalar(g["height_norm"])}'
            '\n      },'
            f'\n      "page_dimensions": {_pagedims_json(g["_page_dimensions"], "        ")}'
            "\n    }"
        )
    out.append("\n  ]," if images else "],")
    out.append('\n  "tables": [')
    for i, tb in enumerate(tables):
        out.append("\n    {" if i == 0 else ",\n    {")
        out.append(
            f'\n      "id": {_esc(tb["id"])},'
            f'\n      "page": {_scalar(tb["page"])},'
            '\n      "position": {'
            f'\n        "x": {_scalar(tb["x"])},'
            f'\n        "y": {_scalar(tb["y"])},'
            f'\n        "width": {_scalar(tb["width"])},'
            f'\n        "height": {_scalar(tb["height"])}'
            '\n      },'
            f'\n      "page_dimensions": {_pagedims_json(tb["_page_dimensions"], "        ")},'
            f'\n      "num_rows": {_scalar(tb["num_rows"])},'
            f'\n      "num_cols": {_scalar(tb["num_cols"])}'
            "\n    }"
        )
    out.append("\n  ]," if tables else "],")
    out.append('\n  "pages": [')
    for i, pd in enumerate(pages_list):
        out.append("\n    {" if i == 0 else ",\n    {")
        out.append(
            f'\n      "page": {i + 1},'
            f'\n      "width": {_scalar(pd["width"])},'
            f'\n      "height": {_scalar(pd["height"])}'
            "\n    }"
        )
    out.append("\n  ]," if pages_list else "],")
    if doc_meta:
        out.append('\n  "metadata": {')
        first = True
        for k, v in doc_meta.items():
            out.append(f"\n    {_esc(k)}: " if first else f",\n    {_esc(k)}: ")
            first = False
            if v is None or v is True or v is False or type(v) in (str, int, float):
                out.append(_scalar(v))
            else:
                # The engine's own doc_meta is scalar-only (see the
                # construction site below), but a future structured field must
                # not silently break the block: fall back to the generic
                # depth-aware encoder, still byte-identical to dumps_indent2.
                _json_enc(v, 2, out)
        out.append("\n  }\n}")
    else:
        out.append('\n  "metadata": {}\n}')
    return "".join(out)


def _metadata_block(images: list[dict], tables: list[dict], pages_list: list[dict], doc_meta: dict) -> str:
    """Fenced-JSON metadata block, structure per reference app/main.py:484-546.
    Byte-identical to json.dumps(_metadata_obj(...), indent=2) (reference
    app/main.py:535) via the fused schema emitter — property-tested."""
    json_str = _metadata_json(images, tables, pages_list, doc_meta)
    return f"{META_BLOCK_PREFIX}\n```json\n{json_str}\n```\n<!-- DOCLING_METADATA_END -->\n"


def extract_document(doc_id: str, spans: Optional[list[dict]],
                     source: Optional[dict] = None) -> dict:
    """Extract one document.  Returns an OUTPUT_SCHEMA-shaped dict.

    Raises on malformed input; the Spark shell converts exceptions into
    ``status='failed'`` rows (mirrors reference app/main.py:338-345).

    ``source`` is optional ingestion metadata (reference ConversionSource,
    app/main.py:44-51): the metadata block stamps ``source.original_name``
    verbatim — upload-kind docs their original filename, url-kind docs NULL
    (the reference never sets original_name for URLs, app/main.py:1100-1105);
    absent column → doc_id (so the no-source output is byte-identical to
    before the column existed).
    """
    if spans is None:
        raise ValueError("document has no spans")
    return extract_document_cols(
        doc_id,
        [s["kind"] for s in spans],
        [s.get("text") for s in spans],
        [s.get("media_ref") for s in spans],
        [s.get("offset") for s in spans],
        source,
    )


def extract_document_cols(doc_id: str, kinds: list, texts: list, refs: list,
                          offs: list, source: Optional[dict] = None) -> dict:
    """Columnar twin of ``extract_document``: the span sequence arrives as
    parallel kind/text/media_ref/offset lists (the Arrow kernel's native
    shape — struct children, no per-span dicts).  Same output, same failure
    contract; ``extract_document`` is a thin splitter over this."""
    pages: dict[int, tuple[float, float]] = {}
    blocks = _collect_blocks(kinds, texts, refs, offs, pages)
    _apply_column_order(blocks, pages)
    blocks.sort(key=lambda b: b.sort_key)

    # Ordinal ids count ALL images/tables in reading order, including images
    # later filtered out (reference increments before filtering,
    # app/main.py:589-590, then `continue`s at 707 without metadata).
    picture_counter = 0
    table_counter = 0
    images_meta: list[dict] = []
    tables_meta: list[dict] = []
    # (page, kind, text, media_ref, level) tuples — NOT dicts: this list is
    # rebuilt per doc and only consumed positionally below (allocation-bound
    # kernel, r4 verdict #1).
    out_blocks: list[tuple] = []

    for b in blocks:
        page = b.sort_key[0]
        if b.kind == "image":
            picture_counter += 1
            image_id = f"picture-{picture_counter}"
            px_w, px_h, content_key = b.payload
            pdims = pages.get(b.box.page)
            if G.image_skip_reason(b.box, px_w, px_h, pdims) is not None:
                continue
            content = content_key.encode("utf-8")
            content_hash = xxh64_hexdigest(content)
            ref = media_key(content)
            norm = G.normalized_coords(b.box, pdims) or {
                "x_norm": None, "y_norm": None, "width_norm": None, "height_norm": None,
            }
            images_meta.append(
                {
                    "id": image_id,
                    "page": b.box.page,
                    "x": b.box.x,
                    "y": b.box.y,
                    "width": b.box.width,
                    "height": b.box.height,
                    "coord_origin": b.box.coord_origin,
                    **norm,
                    "content_hash": content_hash,
                    "_page_dimensions": (
                        {"width": pdims[0], "height": pdims[1]} if pdims else None
                    ),
                }
            )
            out_blocks.append((page, "image", b.text, ref, 0))
        elif b.kind == "table":
            table_counter += 1
            table_id = f"table-{table_counter}"
            cells, caption = b.payload
            num_rows = len(cells)
            num_cols = max((len(r) for r in cells), default=0)
            pdims = pages.get(b.box.page)
            tables_meta.append(
                {
                    "id": table_id,
                    "page": b.box.page,
                    "x": b.box.x,
                    "y": b.box.y,
                    "width": b.box.width,
                    "height": b.box.height,
                    "num_rows": num_rows,
                    "num_cols": num_cols,
                    "caption": caption,
                    "_page_dimensions": (
                        {"width": pdims[0], "height": pdims[1]} if pdims else None
                    ),
                }
            )
            out_blocks.append((page, "table", _render_table(cells), "", 0))
        else:
            out_blocks.append((page, b.kind, b.text, "", b.level))

    # --- Page-marker assembly (reference app/main.py:431-482 semantics) ---
    out_spans: list[dict] = []
    md_chunks: list[str] = []
    if not pages:
        # No declared pages → whole doc, no markers (reference :442-450).
        for _pg, kind, text, ref, level in out_blocks:
            out_spans.append({"kind": kind, "text": text, "media_ref": ref})
        md_chunks.extend(_render_block(k, t, lv, r) for _p, k, t, r, lv in out_blocks)
        markdown_body = "\n\n".join(md_chunks)
    else:
        # Group once (O(blocks)); out_blocks is already in reading order, so
        # each page's list stays ordered.
        blocks_by_page: dict[int, list[tuple]] = {}
        for b in out_blocks:
            blocks_by_page.setdefault(b[0], []).append(b)
        page_order = sorted(set(pages) | set(blocks_by_page))
        nonempty = 0
        for page_no in page_order:
            page_blocks = blocks_by_page.get(page_no, [])
            if not page_blocks:
                continue  # empty page: no marker (reference :466-467)
            nonempty += 1
            marker = f"<!-- Page {page_no} -->"
            out_spans.append({"kind": "page_marker", "text": marker, "media_ref": ""})
            for _pg, kind, text, ref, _lv in page_blocks:
                out_spans.append({"kind": kind, "text": text, "media_ref": ref})
            page_md = "\n\n".join(
                _render_block(k, t, lv, r) for _p, k, t, r, lv in page_blocks
            )
            md_chunks.append(f"{marker}\n\n{page_md}")
        if nonempty == 0:
            # Pages exist but all empty → single Page 1 marker (reference :472-480).
            marker = "<!-- Page 1 -->"
            out_spans.append({"kind": "page_marker", "text": marker, "media_ref": ""})
            markdown_body = f"{marker}\n\n"
        else:
            markdown_body = "\n\n".join(md_chunks)

    for i, s in enumerate(out_spans):
        s["offset"] = i

    pages_list = [
        {"page": p, "width": w, "height": h} for p, (w, h) in sorted(pages.items())
    ]
    source_filename = doc_id
    if source:
        # Reference parity: metadata stores source.original_name verbatim
        # (app/main.py:323); url-kind sources never set original_name
        # (app/main.py:1100-1105), so their source_filename is null — NOT
        # the URL.  Only the no-source legacy path falls back to doc_id.
        source_filename = source.get("original_name")
    doc_meta = {
        "total_pages": len(pages_list),
        "total_images": len(images_meta),
        "total_tables": len(tables_meta),
        "source_filename": source_filename,
        # Deterministic engine: wall time is a run-level metric (lineage table),
        # never a per-row value; reference stores it per task (app/main.py:317).
        "processing_time_ms": None,
    }
    markdown = markdown_body + _metadata_block(images_meta, tables_meta, pages_list, doc_meta)

    def _strip(meta: dict) -> dict:
        return {k: v for k, v in meta.items() if not k.startswith("_")}

    return {
        "doc_id": doc_id,
        "spans": out_spans,
        "images": [_strip(m) for m in images_meta],
        "tables": [_strip(m) for m in tables_meta],
        "pages": pages_list,
        "markdown": markdown,
        "status": "completed",
        "detail": None,
    }
