"""Property-based tests (hypothesis): determinism and invariance guarantees
the north rule depends on.  Pure engine — no SparkSession."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from docling_service_spark.corpus import build_doc
from docling_service_spark.engine import geometry as G
from docling_service_spark.engine.extract import extract_document

PW, PH = 612.0, 792.0


def _spans_key(result):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in result["spans"]]


# --- determinism over the generator's whole document space -------------------

@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=5000))
def test_extract_deterministic_and_dense_offsets(idx):
    doc = build_doc(idx)
    try:
        r1 = extract_document(doc["doc_id"], doc["spans"])
    except G.MediaRefError:
        return  # malformed family: raising is the contract
    r2 = extract_document(doc["doc_id"], build_doc(idx)["spans"])
    assert _spans_key(r1) == _spans_key(r2)
    assert [s["offset"] for s in r1["spans"]] == list(range(len(r1["spans"])))
    # Ordinal ids dense per kind in metadata arrays.
    assert [t["id"] for t in r1["tables"]] == [f"table-{i + 1}" for i in range(len(r1["tables"]))]


# --- input-order invariance ---------------------------------------------------

@st.composite
def positioned_doc(draw):
    """A doc of positioned blocks with unique (page, y, x) — reading order is
    then fully geometry-determined, so ANY input permutation must extract
    identically."""
    n_pages = draw(st.integers(1, 3))
    n_blocks = draw(st.integers(1, 12))
    coords = draw(
        st.lists(
            st.tuples(
                st.integers(1, n_pages),
                st.integers(0, 70),   # y slot
                st.integers(0, 3),    # x slot
            ),
            min_size=n_blocks, max_size=n_blocks, unique=True,
        )
    )
    spans = [{"kind": "page_dims", "text": "", "media_ref": f"{p},{PW},{PH}", "offset": 0}
             for p in range(1, n_pages + 1)]
    for i, (page, ys, xs) in enumerate(coords):
        y = 40.0 + ys * 10.0
        x = 50.0 + xs * 120.0
        origin = draw(st.sampled_from(["TOPLEFT", "BOTTOMLEFT"]))
        y_enc = y if origin == "TOPLEFT" else PH - y
        spans.append({"kind": "text_block", "text": f"block-{i}",
                      "media_ref": f"{page},{x},{y_enc},100,9,{origin},text", "offset": 0})
    return spans


@settings(max_examples=30, deadline=None)
@given(positioned_doc(), st.randoms(use_true_random=False))
def test_input_permutation_invariance(spans, rnd):
    base = [dict(s, offset=i) for i, s in enumerate(spans)]
    r_base = extract_document("d", base)
    shuffled = list(spans)
    rnd.shuffle(shuffled)
    shuffled = [dict(s, offset=i) for i, s in enumerate(shuffled)]
    r_shuf = extract_document("d", shuffled)
    assert _spans_key(r_base) == _spans_key(r_shuf)


# --- filter semantics vs an independent predicate ------------------------------

def _independent_skip(box, px_w, px_h, dims):
    """Deliberately different formulation of app/main.py:651-699."""
    if min(px_w, px_h) <= 49:
        return True
    if box is None or dims is None:
        return False
    pw, ph = dims
    if ph > 0:
        top = box.y if box.coord_origin == "BOTTOMLEFT" else ph - box.y
        bot = top - box.height
        top, bot = (min(max(v, 0.0), ph) for v in (top, bot))
        if bot > 0.95 * ph or top < 0.05 * ph:
            return True
    if pw > 0 and ph > 0 and (box.width * box.height) / (pw * ph) < 0.005:
        return True
    return False


@settings(max_examples=200, deadline=None)
@given(
    st.floats(0, PW), st.floats(-50, PH + 50),
    st.floats(0.1, 500), st.floats(0.1, 500),
    st.integers(1, 400), st.integers(1, 400),
    st.sampled_from(["TOPLEFT", "BOTTOMLEFT"]),
)
def test_filters_match_independent_predicate(x, y, w, h, px_w, px_h, origin):
    box = G.BBox(page=1, x=x, y=y, width=w, height=h, coord_origin=origin)
    ours = G.image_skip_reason(box, px_w, px_h, (PW, PH)) is not None
    theirs = _independent_skip(box, px_w, px_h, (PW, PH))
    assert ours == theirs


# --- media_ref fuzzing: garbage must raise, never corrupt ----------------------

@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_malformed_refs_raise_cleanly(ref):
    spans = [{"kind": "image", "text": "", "media_ref": ref, "offset": 0}]
    try:
        r = extract_document("d", spans)
    except (G.MediaRefError, ValueError):
        return
    # If it parsed, it must have produced a well-formed result.
    assert r["status"] == "completed"
