"""Geometry: media_ref encodings, coordinate origins, reading order, image filters.

Raw-span media_ref encodings (the corpus wire format, FIXTURES.md §1):

- ``page_dims``:   ``"{page},{width},{height}"``
- ``text_block``:  ``"{page},{x},{y},{w},{h},{origin},{role}"``
- ``table_block``: ``"{page},{x},{y},{w},{h},{origin}"``
- ``image``:       ``"{page},{x},{y},{w},{h},{origin},{px_w},{px_h},{content_key}"``
- ``html``:        ``"page={n}"`` or ``""``
- ``sheet_grid``:  ``"sheet={n}"`` (spreadsheet family; text = JSON grid)
- ``slide_block``: ``"slide={n},{order},{role}"`` (slide family)

``origin`` is ``TOPLEFT`` or ``BOTTOMLEFT``.  ``y`` is the coordinate of the
**top edge** of the box expressed in the native origin — this mirrors docling
provenance where ``bbox.t`` is stored as-is whatever the origin (reference:
``app/main.py:608-617``: ``y = bbox.t``, ``h = |b - t|``).  In BOTTOMLEFT the
top edge therefore has the *larger* y value.

Image-filter semantics replicate the reference exactly (``app/main.py:574-577,
651-699``): strict ``<`` / ``>`` comparisons, edge clamping to ``[0, page_h]``,
filters 2 and 3 applied only when both position and page dimensions are known.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

# Reference thresholds, app/main.py:574-577.
MIN_IMAGE_WIDTH_PX = 50
MIN_IMAGE_HEIGHT_PX = 50
HEADER_FOOTER_MARGIN = 0.05
MIN_AREA_RATIO = 0.005

TOPLEFT = "TOPLEFT"
BOTTOMLEFT = "BOTTOMLEFT"


@dataclass(frozen=True)
class BBox:
    """Box position: x = left edge, y = top edge in the native origin."""

    page: int
    x: float
    y: float
    width: float
    height: float
    coord_origin: str = BOTTOMLEFT


class MediaRefError(ValueError):
    """Malformed media_ref; surfaces as a failed row (app/main.py:338-345)."""


def parse_page_dims(media_ref: str) -> tuple[int, float, float]:
    parts = media_ref.split(",")
    if len(parts) != 3:
        raise MediaRefError(f"page_dims media_ref must be 'page,w,h': {media_ref!r}")
    return int(parts[0]), float(parts[1]), float(parts[2])


def _parse_box(parts: list[str]) -> BBox:
    page = int(parts[0])
    x, y, w, h = (float(p) for p in parts[1:5])
    origin = parts[5].upper()
    if origin not in (TOPLEFT, BOTTOMLEFT):
        raise MediaRefError(f"unknown coord origin {origin!r}")
    return BBox(page=page, x=x, y=y, width=w, height=h, coord_origin=origin)


def parse_text_block_ref(media_ref: str) -> tuple[BBox, str]:
    parts = media_ref.split(",")
    if len(parts) != 7:
        raise MediaRefError(f"text_block media_ref needs 7 fields: {media_ref!r}")
    return _parse_box(parts), parts[6]


def parse_table_block_ref(media_ref: str) -> BBox:
    parts = media_ref.split(",")
    if len(parts) != 6:
        raise MediaRefError(f"table_block media_ref needs 6 fields: {media_ref!r}")
    return _parse_box(parts)


def parse_sheet_ref(media_ref: str) -> int:
    """``sheet_grid`` media_ref: ``"sheet={n}"`` (1-based sheet index).

    Spreadsheet documents (reference whitelist ``.xlsx``, app/main.py:1072-1079)
    carry no geometry: each sheet is a logical page whose content is one
    grid-of-cells table."""
    if not media_ref.startswith("sheet="):
        raise MediaRefError(f"sheet_grid media_ref must be 'sheet=N': {media_ref!r}")
    try:
        n = int(media_ref[len("sheet="):])
    except ValueError as exc:
        raise MediaRefError(f"bad sheet index in {media_ref!r}") from exc
    if n < 1:
        raise MediaRefError(f"sheet index must be >= 1: {media_ref!r}")
    return n


SLIDE_ROLES = ("title", "subtitle", "bullet", "notes")


def parse_slide_ref(media_ref: str) -> tuple[int, int, str]:
    """``slide_block`` media_ref: ``"slide={n},{order},{role}"``.

    Slide documents (reference whitelist ``.pptx``): each slide is a page;
    ``order`` is the placeholder order within the slide (title box, body
    placeholders, notes) — slide layouts are ordered by placeholder, not by
    free geometry."""
    if not media_ref.startswith("slide="):
        raise MediaRefError(f"slide_block media_ref must be 'slide=N,order,role': {media_ref!r}")
    parts = media_ref[len("slide="):].split(",")
    if len(parts) != 3:
        raise MediaRefError(f"slide_block media_ref needs 3 fields: {media_ref!r}")
    try:
        n, order = int(parts[0]), int(parts[1])
    except ValueError as exc:
        raise MediaRefError(f"bad slide/order in {media_ref!r}") from exc
    role = parts[2]
    if n < 1:
        raise MediaRefError(f"slide index must be >= 1: {media_ref!r}")
    if role not in SLIDE_ROLES:
        raise MediaRefError(f"unknown slide role {role!r}")
    return n, order, role


FLOW_ROLES = ("heading", "para", "list", "code", "table")
_FLOW_MAX_HEADING = 6
_FLOW_MAX_LIST_DEPTH = 8


def parse_flow_ref(media_ref: str) -> tuple[int, str, int]:
    """``flow_block`` media_ref: ``"block={order},{role},{level}"``.

    Word-processing documents (reference whitelist ``.docx``,
    app/main.py:1072-1079): styled blocks flow in document order with NO
    geometry and no pages until pagination — ``order`` is the block's
    position in the flow.  ``level`` is the heading level (1-6) for
    ``heading`` and the nesting depth (0-8) for ``list``; must be 0 for
    the other roles."""
    if not media_ref.startswith("block="):
        raise MediaRefError(f"flow_block media_ref must be 'block=N,role,level': {media_ref!r}")
    parts = media_ref[len("block="):].split(",")
    if len(parts) != 3:
        raise MediaRefError(f"flow_block media_ref needs 3 fields: {media_ref!r}")
    try:
        order, level = int(parts[0]), int(parts[2])
    except ValueError as exc:
        raise MediaRefError(f"bad flow order/level in {media_ref!r}") from exc
    role = parts[1]
    if order < 0:
        raise MediaRefError(f"flow order must be >= 0: {media_ref!r}")
    if role not in FLOW_ROLES:
        raise MediaRefError(f"unknown flow role {role!r}")
    if role == "heading":
        if not 1 <= level <= _FLOW_MAX_HEADING:
            raise MediaRefError(f"heading level must be 1-{_FLOW_MAX_HEADING}: {media_ref!r}")
    elif role == "list":
        if not 0 <= level <= _FLOW_MAX_LIST_DEPTH:
            raise MediaRefError(f"list depth must be 0-{_FLOW_MAX_LIST_DEPTH}: {media_ref!r}")
    elif level != 0:
        raise MediaRefError(f"level must be 0 for role {role!r}: {media_ref!r}")
    return order, role, level


def parse_image_ref(media_ref: str) -> tuple[BBox, int, int, str]:
    parts = media_ref.split(",", 8)
    if len(parts) != 9:
        raise MediaRefError(f"image media_ref needs 9 fields: {media_ref!r}")
    return _parse_box(parts), int(parts[6]), int(parts[7]), parts[8]


def y_from_top(box: BBox, page_height: Optional[float]) -> float:
    """Distance of the box's top edge from the top of the page.

    The deterministic reading-order key (SURVEY.md §4 item 3): blocks sort by
    ``(page, y_from_top, x, input_offset)``.  When page height is unknown for a
    BOTTOMLEFT box, ``-y`` preserves top-first ordering.
    """
    if box.coord_origin == TOPLEFT:
        return box.y
    if page_height is None:
        return -box.y
    return page_height - box.y


COLUMN_TOL_FRAC = 0.02


def column_class(box: Optional[BBox], page_width: Optional[float]) -> str:
    """Two-column layout classification: 'L' (entirely left of the page
    midline), 'R' (entirely right), or 'F' (full-width / crosses the middle).

    Used by the reading-order re-keying pass (extract._apply_column_order):
    a page reads column-wise only when it has evidence of BOTH columns."""
    if box is None or not page_width or page_width <= 0:
        return "F"
    split = page_width / 2
    tol = page_width * COLUMN_TOL_FRAC
    if box.x + box.width <= split + tol:
        return "L"
    if box.x >= split - tol:
        return "R"
    return "F"


def image_skip_reason(
    box: Optional[BBox],
    px_w: int,
    px_h: int,
    page_dims: Optional[tuple[float, float]],
) -> Optional[str]:
    """Reference image filters 1-3 (app/main.py:651-699). None = keep."""
    # Filter 1: pixel size (strict <; 50x50 is kept, 49x50 is skipped).
    if px_w < MIN_IMAGE_WIDTH_PX or px_h < MIN_IMAGE_HEIGHT_PX:
        return f"too small ({px_w}x{px_h}px)"

    # Filter 2: entirely inside the top/bottom 5% zone (both edges past the
    # strict threshold, after conversion to bottom-up coordinates + clamping).
    if box is not None and page_dims is not None:
        pw, ph = page_dims
        if ph > 0:
            if box.coord_origin == TOPLEFT:
                top_fb = ph - box.y
                bottom_fb = ph - box.y - box.height
            else:
                top_fb = box.y
                bottom_fb = box.y - box.height
            top_fb = max(0.0, min(ph, top_fb))
            bottom_fb = max(0.0, min(ph, bottom_fb))
            header_threshold = (1 - HEADER_FOOTER_MARGIN) * ph
            footer_threshold = HEADER_FOOTER_MARGIN * ph
            if bottom_fb > header_threshold:
                return f"entirely in header zone (bottom={bottom_fb:.1f} > {header_threshold:.1f})"
            if top_fb < footer_threshold:
                return f"entirely in footer zone (top={top_fb:.1f} < {footer_threshold:.1f})"

    # Filter 3: tiny area ratio (strict <).
    if box is not None and page_dims is not None:
        pw, ph = page_dims
        if pw > 0 and ph > 0:
            area_ratio = (box.width * box.height) / (pw * ph)
            if area_ratio < MIN_AREA_RATIO:
                return f"tiny area ({area_ratio * 100:.2f}% < {MIN_AREA_RATIO * 100:.1f}%)"

    return None


def normalized_coords(box: BBox, page_dims: Optional[tuple[float, float]]) -> Optional[dict]:
    """Normalized 0-1 coordinates, rounded to 4 dp (app/main.py:627-633).

    Raw values are normalized as-is (no origin conversion), matching the
    reference.
    """
    if page_dims is None:
        return None
    pw, ph = page_dims
    if pw <= 0 or ph <= 0:
        return None
    return {
        "x_norm": round(box.x / pw, 4),
        "y_norm": round(box.y / ph, 4),
        "width_norm": round(box.width / pw, 4),
        "height_norm": round(box.height / ph, 4),
    }
