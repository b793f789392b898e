"""Image-filter boundary semantics, replicated from reference app/main.py:651-699."""

from docling_service_spark.engine.geometry import (
    BBox,
    image_skip_reason,
    normalized_coords,
    y_from_top,
)

PW, PH = 612.0, 792.0
DIMS = (PW, PH)


def box(x, y, w, h, origin="TOPLEFT", page=1):
    return BBox(page=page, x=x, y=y, width=w, height=h, coord_origin=origin)


# --- Filter 1: pixel size (strict <50) -------------------------------------

def test_pixel_filter_boundaries():
    big = box(72, 300, 240, 160)
    assert image_skip_reason(big, 50, 50, DIMS) is None          # 50x50 kept
    assert "too small" in image_skip_reason(big, 49, 50, DIMS)   # width < 50
    assert "too small" in image_skip_reason(big, 50, 49, DIMS)   # height < 50
    assert "too small" in image_skip_reason(big, 1, 1, DIMS)


# --- Filter 2: header/footer zone (entirely inside, strict >/<) ------------

def test_footer_zone_topleft():
    # footer threshold = 0.05*792 = 39.6 from bottom; TOPLEFT top_fb = PH - y.
    inside = box(72, 760, 100, 20)     # top_fb = 32 < 39.6 → skip
    assert "footer zone" in image_skip_reason(inside, 300, 200, DIMS)
    straddling = box(72, 745, 100, 40)  # top_fb = 47 > 39.6 → keep
    assert image_skip_reason(straddling, 300, 200, DIMS) is None


def test_header_zone_topleft_with_clamping():
    # header threshold = 0.95*792 = 752.4 from bottom; bottom_fb = PH - y - h.
    inside = box(72, 5, 300, 20)       # bottom_fb = 767 > 752.4 → skip
    assert "header zone" in image_skip_reason(inside, 300, 200, DIMS)
    off_page = box(72, -10, 300, 30)   # top clamps to PH; bottom_fb = 772 → skip
    assert "header zone" in image_skip_reason(off_page, 300, 200, DIMS)
    straddling = box(72, 10, 300, 60)  # bottom_fb = 722 < 752.4 → keep
    assert image_skip_reason(straddling, 300, 200, DIMS) is None


def test_zones_bottomleft():
    # BOTTOMLEFT: y is the top edge measured from the bottom.
    footer_inside = box(72, 32.0, 100, 20, origin="BOTTOMLEFT")  # top_fb=32 <39.6
    assert "footer zone" in image_skip_reason(footer_inside, 300, 200, DIMS)
    header_inside = box(72, 787.0, 300, 20, origin="BOTTOMLEFT")  # bottom_fb=767 >752.4
    assert "header zone" in image_skip_reason(header_inside, 300, 200, DIMS)
    content = box(72, 492.0, 240, 160, origin="BOTTOMLEFT")
    assert image_skip_reason(content, 300, 200, DIMS) is None


def test_zone_filter_requires_page_dims():
    inside = box(72, 760, 300, 20)
    assert image_skip_reason(inside, 300, 200, None) is None  # no dims → filters 2-3 skipped
    assert image_skip_reason(None, 300, 200, DIMS) is None    # no position → same


# --- Filter 3: area ratio (strict < 0.005) ----------------------------------

def test_area_filter_boundaries():
    # page area = 484704; 0.5% = 2423.52
    keep = box(72, 300, 100, 25)   # 2500 → 0.00516 ≥ 0.005 keep
    assert image_skip_reason(keep, 300, 200, DIMS) is None
    skip = box(72, 300, 100, 24)   # 2400 → 0.00495 < 0.005 skip
    assert "tiny area" in image_skip_reason(skip, 300, 200, DIMS)


def test_filter_priority_order():
    # Pixel filter wins over zone/area (reference checks in order, first reason sticks).
    tiny_in_footer = box(72, 760, 10, 10)
    assert "too small" in image_skip_reason(tiny_in_footer, 10, 10, DIMS)


# --- Coordinates -------------------------------------------------------------

def test_y_from_top_both_origins():
    assert y_from_top(box(0, 100, 10, 10), PH) == 100.0
    assert y_from_top(box(0, 692.0, 10, 10, origin="BOTTOMLEFT"), PH) == 100.0
    # Unknown page height: BOTTOMLEFT falls back to -y (top-first order preserved).
    assert y_from_top(box(0, 692.0, 10, 10, origin="BOTTOMLEFT"), None) == -692.0


def test_normalized_coords_rounding():
    b = box(72.0, 300.0, 240.0, 160.0)
    n = normalized_coords(b, DIMS)
    assert n == {
        "x_norm": round(72.0 / PW, 4),
        "y_norm": round(300.0 / PH, 4),
        "width_norm": round(240.0 / PW, 4),
        "height_norm": round(160.0 / PH, 4),
    }
    assert normalized_coords(b, None) is None
    assert normalized_coords(b, (0.0, PH)) is None
