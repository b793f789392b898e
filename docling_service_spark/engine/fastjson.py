"""Byte-identical fast path for ``json.dumps(obj, indent=2)``.

stdlib json falls back to its pure-Python encoder whenever ``indent`` is set
(the C encoder only handles compact output), and the per-document metadata
block (engine/extract.py) spends ~20% of extraction time there.  This module
reimplements exactly the subset the engine emits — dict/list/str/int/float/
bool/None, insertion-ordered keys, ensure_ascii — reusing the C-accelerated
string escaper, and is property-tested for byte equality against
``json.dumps(obj, indent=2)`` (tests/test_fastjson.py).
"""

from __future__ import annotations

from json.encoder import encode_basestring_ascii as _esc

_INDENTS = [""] + ["\n" + "  " * i for i in range(1, 32)]


def _pad(depth: int) -> str:
    return _INDENTS[depth] if depth < len(_INDENTS) else "\n" + "  " * depth


def _enc(obj, depth: int, out: list) -> None:
    if obj is None:
        out.append("null")
    elif obj is True:
        out.append("true")
    elif obj is False:
        out.append("false")
    elif isinstance(obj, str):
        out.append(_esc(obj))
    elif isinstance(obj, int):
        out.append(repr(obj))
    elif isinstance(obj, float):
        out.append(_float_repr(obj))
    elif isinstance(obj, dict):
        if not obj:
            out.append("{}")
            return
        pad = _pad(depth + 1)
        out.append("{")
        first = True
        for k, v in obj.items():
            out.append(pad if first else "," + pad)
            first = False
            out.append(_esc(k))
            out.append(": ")
            _enc(v, depth + 1, out)
        out.append(_pad(depth) if depth else "\n")
        out.append("}")
    elif isinstance(obj, (list, tuple)):
        if not obj:
            out.append("[]")
            return
        pad = _pad(depth + 1)
        out.append("[")
        first = True
        for v in obj:
            out.append(pad if first else "," + pad)
            first = False
            _enc(v, depth + 1, out)
        out.append(_pad(depth) if depth else "\n")
        out.append("]")
    else:
        raise TypeError(f"Object of type {type(obj).__name__} is not JSON serializable")


def _float_repr(o: float) -> str:
    # Mirrors json.encoder.floatstr defaults (allow_nan=True).
    if o != o:
        return "NaN"
    if o == float("inf"):
        return "Infinity"
    if o == float("-inf"):
        return "-Infinity"
    return float.__repr__(o)


def dumps_indent2(obj) -> str:
    """Exactly ``json.dumps(obj, indent=2)`` for the engine's value domain."""
    out: list = []
    _enc(obj, 0, out)
    return "".join(out)
