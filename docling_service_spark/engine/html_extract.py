"""HTML main-content extraction: stdlib DOM parse + boilerplate stripping.

From-scratch implementation of the text-density / link-density family of
heuristics (Readability, Boilerpipe, trafilatura lineage — see PAPERS.md).
The reference delegates this class of work to docling's converter
(``app/main.py:199-231``); here it is an explicit, unit-testable operator.

Pipeline per HTML fragment:

1. Parse with :class:`html.parser.HTMLParser` into a lightweight element tree.
2. Prune non-content subtrees (script/style/svg/form/...).
3. Prune boilerplate containers: structural tags (nav/aside/footer/header/menu)
   and elements whose id/class/role tokens match the boilerplate vocabulary.
4. Walk remaining tree in document order; emit leaf blocks
   (p/h1-h6/li/pre/blockquote/figcaption, and divs with inline-only content).
5. Score each block by text length and link density; keep per the rules in
   :func:`_keep_block`.

The classifier is a pure function of the fragment text, so extraction order is
invariant under any Spark partitioning.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Optional, Union

DROP_TAGS = frozenset(
    "script style noscript template svg iframe form button select option input textarea canvas".split()
)
BOILERPLATE_TAGS = frozenset("nav aside footer header menu".split())
_BOILERPLATE_TOKEN_RE = re.compile(
    r"(?:^|[-_ ])(nav|navbar|menu|footer|header|sidebar|side|ad|ads|advert|advertisement|"
    r"banner|breadcrumb|breadcrumbs|comment|comments|share|social|related|promo|sponsor|"
    r"widget|cookie|popup|modal|subscribe|newsletter|pagination|meta|byline|masthead)(?:[-_ ]|$)"
)
VOID_TAGS = frozenset("br hr img meta link input area base col embed source track wbr".split())
HEADING_TAGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])
LEAF_BLOCK_TAGS = HEADING_TAGS | frozenset("p li pre blockquote figcaption".split())
CONTAINER_TAGS = frozenset(
    "html body div main article section ul ol figure table thead tbody tr td th span a".split()
)

# Keep-rule thresholds (documented knobs of OUR heuristic, not the reference's;
# the reference has no HTML path of its own — docling does it opaquely).
MIN_TEXT_LEN = 25
MAX_LINK_DENSITY = 0.333
LONG_TEXT_LEN = 80
LONG_TEXT_MAX_LINK_DENSITY = 0.5
MIN_LIST_ITEM_LEN = 20

def _norm_text(s: str) -> str:
    # Identical to re.sub(r"\s+", " ", s).strip(), but C-level: split() breaks
    # on any whitespace run and drops leading/trailing.
    return " ".join(s.split())


class _Element:
    __slots__ = ("tag", "attrs_raw", "children")

    def __init__(self, tag: str, attrs_raw: str):
        self.tag = tag
        self.attrs_raw = attrs_raw  # unparsed attribute text; parsed lazily
        self.children: list[Union[_Element, str]] = []


# --- fast tokenizer (primary) ---------------------------------------------------
#
# stdlib html.parser is ~half of per-document extraction CPU; this regex
# tokenizer builds the same tree ~3x faster for real-world markup.  It is
# deliberately lenient (unmatched tags ignored, garbage treated as text) and
# deterministic; on any internal error the stdlib parser takes over
# (differential-tested across the whole corpus space in
# tests/test_html_fast_parity.py).

_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                 # comments (unterminated → to EOF)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"        # CDATA
    r"|<![^>]*>?"                        # doctype / other declarations
    r"|<\?[^>]*>?"                       # processing instructions
    r"|<(/?)([a-zA-Z][a-zA-Z0-9-]*)"     # 1: closing slash, 2: tag name
    # 3: attribute text.  The unquoted branch must EXCLUDE quote characters:
    # with a bare [^>] fallback every quote char is matched by two branches
    # and a run of unpaired quotes backtracks exponentially (a 50-char
    # hostile tag hung the extractor >10 s).  Disjoint branches = linear.
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"
    r"(/?)>",                            # 4: self-closing slash
    re.S,
)
_RAWTEXT_TAGS = frozenset(["script", "style", "textarea", "title"])
# Case-insensitive close-tag scanners for rawtext elements.  Searching the
# original string keeps offsets valid — str.lower() can CHANGE LENGTH
# (e.g. 'İ' U+0130 lowercases to two chars), which shifted indices and
# silently swallowed content after the rawtext element.
_RAWTEXT_CLOSE = {t: re.compile(f"</{t}", re.I) for t in _RAWTEXT_TAGS}


def _unescape(text: str) -> str:
    if "&" in text:
        from html import unescape

        return unescape(text)
    return text


def _fast_build(fragment: str) -> _Element:
    root = _Element("#root", "")
    stack = [root]
    pos = 0
    n = len(fragment)
    while pos < n:
        m = _TOKEN_RE.search(fragment, pos)
        if m is None:
            tail = fragment[pos:]
            if tail:
                stack[-1].children.append(_unescape(tail))
            break
        if m.start() > pos:
            stack[-1].children.append(_unescape(fragment[pos : m.start()]))
        pos = m.end()
        # One groups() call instead of four group(i) lookups, and skip the
        # lower() allocation for already-lowercase markup (the common case)
        # — this loop runs once per token and is the kernel's hottest
        # non-extract function.
        closing, tag, attrs, selfclose = m.groups()
        if tag is None:
            continue  # comment / doctype / PI
        if not tag.islower():
            tag = tag.lower()
        if closing:  # closing tag
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        el = _Element(tag, attrs)
        stack[-1].children.append(el)
        if selfclose or tag in VOID_TAGS:
            continue
        if tag in _RAWTEXT_TAGS:
            close = _RAWTEXT_CLOSE[tag].search(fragment, pos)
            if close is None:
                el.children.append(fragment[pos:])
                break
            el.children.append(fragment[pos : close.start()])
            gt = fragment.find(">", close.end())
            pos = n if gt == -1 else gt + 1
            continue
        stack.append(el)
    return root


# --- stdlib fallback --------------------------------------------------------------

class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Element("#root", "")
        self._stack = [self.root]

    @staticmethod
    def _raw(attrs) -> str:
        return " ".join(f'{k}="{v or ""}"' for k, v in attrs)

    def handle_starttag(self, tag: str, attrs) -> None:
        el = _Element(tag, self._raw(attrs))
        self._stack[-1].children.append(el)
        if tag not in VOID_TAGS:
            self._stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._stack[-1].children.append(_Element(tag, self._raw(attrs)))

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # Unmatched close tag: ignore (lenient, like browsers).

    def handle_data(self, data: str) -> None:
        if data:
            self._stack[-1].children.append(data)


_ATTR_VAL_RE = re.compile(r"(?:^|\s)(?:id|class|role)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s\"'>]+))",
                          re.I)


def _is_boilerplate(el: _Element) -> bool:
    if el.tag in BOILERPLATE_TAGS:
        return True
    raw = el.attrs_raw
    if not raw:
        return False
    raw_l = raw.lower()
    if "id" not in raw_l and "class" not in raw_l and "role" not in raw_l:
        return False
    vals = [_unescape(a or b or c) for a, b, c in _ATTR_VAL_RE.findall(raw)]
    tokens = " ".join(v for v in vals if v).lower()
    return bool(tokens and _BOILERPLATE_TOKEN_RE.search(tokens))


def _text_and_link_len(el: _Element, in_link: bool = False) -> tuple[str, int]:
    """Concatenated text of a subtree and the length of text under <a>."""
    parts: list[str] = []
    link_len = 0
    for child in el.children:
        if isinstance(child, str):
            parts.append(child)
            if in_link:
                link_len += len(_norm_text(child))
        else:
            if child.tag in DROP_TAGS:
                continue
            t, ll = _text_and_link_len(child, in_link or child.tag == "a")
            parts.append(t)
            link_len += ll
    return " ".join(parts), link_len


def _keep_block(tag: str, text: str, link_density: float) -> bool:
    if not text:
        return False
    if tag in HEADING_TAGS:
        return link_density < 0.5
    if tag == "pre":
        return True
    if tag == "figcaption":
        return True
    if tag == "li":
        return len(text) >= MIN_LIST_ITEM_LEN and link_density <= MAX_LINK_DENSITY
    if len(text) >= LONG_TEXT_LEN:
        return link_density <= LONG_TEXT_MAX_LINK_DENSITY
    return len(text) >= MIN_TEXT_LEN and link_density <= MAX_LINK_DENSITY


def _block_kind(tag: str) -> str:
    if tag in HEADING_TAGS:
        return "heading"
    if tag == "li":
        return "list_item"
    if tag == "pre":
        return "code"
    if tag == "figcaption":
        return "caption"
    return "text"


def _heading_level(tag: str) -> int:
    return int(tag[1]) if tag in HEADING_TAGS else 0


def _has_element_children(el: _Element) -> bool:
    return any(isinstance(c, _Element) and c.tag not in ("a", "b", "i", "em", "strong", "code", "span", "br")
               for c in el.children)


def _emit(el: _Element, out: list[tuple[str, str, int]]) -> None:
    for child in el.children:
        if isinstance(child, str):
            continue
        if child.tag in DROP_TAGS or _is_boilerplate(child):
            continue
        if child.tag in LEAF_BLOCK_TAGS or (child.tag == "div" and not _has_element_children(child)):
            raw, link_len = _text_and_link_len(child)
            text = _norm_text(raw)
            density = (link_len / len(text)) if text else 1.0
            if _keep_block(child.tag, text, density):
                out.append((_block_kind(child.tag), text, _heading_level(child.tag)))
            continue  # leaf blocks are terminal: no descent
        _emit(child, out)


def _build_tree(fragment: str, force_stdlib: bool = False) -> _Element:
    if not force_stdlib:
        try:
            return _fast_build(fragment)
        except Exception:  # pragma: no cover — deterministic fallback
            pass
    builder = _TreeBuilder()
    builder.feed(fragment)
    builder.close()
    return builder.root


def extract_html_blocks(fragment: str, *, force_stdlib: bool = False) -> list[tuple[str, str, int]]:
    """Extract main-content blocks from an HTML fragment.

    Returns ``[(kind, text, heading_level), ...]`` in document order, where
    kind ∈ {heading, text, list_item, code, caption} and heading_level is
    1-6 for headings, 0 otherwise.  ``force_stdlib`` exists for the
    fast-vs-stdlib differential tests.
    """
    out: list[tuple[str, str, int]] = []
    _emit(_build_tree(fragment, force_stdlib), out)
    return out
