"""From-scratch HTML main-content extraction: DOM parse → boilerplate strip →
ordered (text | table | media) spans.

The north rule names "HTML boilerplate strip … DOM heuristics" as part of the
main-content pipeline over interleaved documents; the reference repo is
PDF-only, so this module is the HTML analogue of the raster kernel: where
`kernel/page.py` turns page pixels into table/plot objects, `extract_main_spans`
turns a raw HTML payload into the same span vocabulary —

* ``text``  — a main-content block (paragraph / heading / list item / caption),
  whitespace-normalized;
* ``table`` — a ``<table>`` recovered to the SAME structured-JSON shape the
  raster path emits (``{"columns", "headers", "records"}`` with the grouped
  colspan-header tree — `kernel/assemble.py` / `fixtures/generate.py`
  ``expected_table_json``), so downstream consumers see one table schema
  regardless of whether the table arrived as pixels or as markup;
* ``media`` — an ``<img src>`` back-pointer (``media_ref`` = the src value).

Boilerplate heuristics are the published, public ones:

* subtree strips for non-content machinery (``script/style/noscript/head`` …)
  and ARIA/HTML5 landmark chrome (``nav/header/footer/aside``) plus a
  class/id vocabulary match — the idea behind Readability's
  "unlikelyCandidates" regex (arc90 readability.js, public domain);
* block-level **link density × word count** scoring — navigation/related-link
  lists are mostly anchor text and short, main prose is not (Kohlschütter,
  Fankhauser, Nejdl, "Boilerplate Detection using Shallow Text Features",
  WSDM 2010: link density and text length are the two strongest shallow
  features).  A block is dropped when >50 % of its characters are anchor text
  AND it has fewer than 25 words.

Everything is deterministic and pure Python with no third-party deps: the
default parser is this module's own regex tokenizer (fast path), with a
stdlib-``html.parser`` tree builder kept as the differential-test oracle —
the Spark stage (`operators/html_extract.py`) batches it inside
``mapInPandas``; no per-row Python ever touches the DataFrame layer.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser

# -------------------------------------------------------------------- DOM

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# subtree removed entirely: never content, regardless of position
DROP_TAGS = frozenset(
    "script style noscript template svg canvas iframe object form button "
    "select textarea datalist head title".split()
)
# HTML5 landmark chrome: site furniture, not document content
LANDMARK_TAGS = frozenset("nav header footer aside".split())
# Readability-style "unlikely candidate" class/id vocabulary
_BOILER_ATTR = re.compile(
    r"(?:^|[\s_-])(nav|menu|footer|sidebar|banner|advert|ads?|promo|sponsor|"
    r"cookie|consent|social|share|comment|breadcrumbs?|related|widget|popup|"
    r"masthead|pagination|pager)(?:$|[\s_-])",
    re.IGNORECASE,
)
# leaf blocks: one emitted text span each
LEAF_BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li pre blockquote dt dd caption figcaption summary".split()
)
# containers: recursed into; bare inline runs between block children become
# implicit text blocks
_CONTAINER_TAGS = frozenset(
    "html body main article section div ul ol dl figure details fieldset "
    "#root".split()
)

LINK_DENSITY_MAX = 0.5
LINK_BLOCK_MAX_WORDS = 25

# HTML-spec clamps (https://html.spec.whatwg.org/#attr-tdth-colspan): colspan
# is limited to 1000, rowspan to 65534.  Untrusted markup like
# colspan="99999999" must not drive the column-slot loops in table_to_json —
# one hostile page would stall the whole Spark task (the per-row error capture
# in operators/html_extract.py only catches exceptions, not unbounded loops).
COLSPAN_MAX = 1000
ROWSPAN_MAX = 65534
# total column slots a single table may occupy; beyond this the row is
# truncated (bounds the per-record padding work at records × TABLE_COLS_MAX)
TABLE_COLS_MAX = 2000


class Node:
    """Minimal DOM node; children are Node | str (text runs)."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict, children: list):
        self.tag = tag
        self.attrs = attrs
        self.children = children

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<{self.tag} {len(self.children)} children>"


# HTML5 implied end tags: starting <tag> closes any open element in the set
_IMPLIES_CLOSE = {
    "li": {"li"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "thead": {"tr", "td", "th"},
    "tbody": {"tr", "td", "th", "thead"},
    "tfoot": {"tr", "td", "th", "tbody"},
    "option": {"option"},
    "a": {"a"},  # HTML5: a new <a> closes an open <a> (anchors never nest)
}
# any block-ish start tag closes an open <p> (HTML5 "closing a p element")
_P_CLOSERS = (
    frozenset("p div ul ol dl table blockquote pre section article main "
              "figure fieldset details hr form".split())
    | LANDMARK_TAGS
    | frozenset(f"h{i}" for i in range(1, 7))
)
# precomputed: start tag → the full set of open tags it implicitly closes
# (per-tag set unions in the hot loop measured ~8% of parse time)
_ALL_CLOSERS: dict[str, frozenset] = {
    t: frozenset(
        set(_IMPLIES_CLOSE.get(t, ())) | ({"p"} if t in _P_CLOSERS else set())
    )
    for t in set(_IMPLIES_CLOSE) | _P_CLOSERS
}


class _DomParser(HTMLParser):
    """Tolerant tree builder: unmatched close tags are ignored, a close tag
    pops every open element above its match (mis-nesting recovers), void
    elements never push, and the common HTML5 implied end tags
    (``<p><p>``, ``<li><li>``, table rows/cells) are honoured."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, [])
        self._stack = [self.root]

    def _implicit_close(self, tag):
        closers = _ALL_CLOSERS.get(tag)
        if closers:
            while len(self._stack) > 1 and self._stack[-1].tag in closers:
                del self._stack[-1]

    def handle_starttag(self, tag, attrs):
        self._implicit_close(tag)
        if tag in VOID_TAGS:
            self.handle_startendtag(tag, attrs)
            return
        node = Node(tag, {k: (v or "") for k, v in attrs}, [])
        self._stack[-1].children.append(node)
        self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(Node(tag, {k: (v or "") for k, v in attrs}, []))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # unmatched </tag>: ignore

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_html_stdlib(html: str) -> Node:
    """Reference tree builder on stdlib ``html.parser`` (differential-test
    oracle for the fast tokenizer below)."""
    p = _DomParser()
    p.feed(html)
    p.close()
    return p.root


# --------------------------------------------------------- fast tokenizer
#
# Profiling showed stdlib HTMLParser at 81% of extract_main_spans wall time
# (its char-by-char goahead loop + per-tag updatepos bookkeeping).  This
# from-scratch regex scanner applies the SAME tree rules (implied end tags,
# void elements, mis-nesting recovery) in one scan — measured ~2.5× the
# parse throughput (1.9× end-to-end extraction), differential-tested
# span-for-span against the stdlib builder.

_TAG_RE = re.compile(
    r"<(?:"
    r"!--(?P<comment>.*?)(?:-->|$)"            # comment
    r"|!(?P<decl>[^>]*)>"                      # doctype / declaration
    r"|\?(?P<pi>[^>]*)>"                       # processing instruction
    r"|/(?P<close>[a-zA-Z][^\s>]*)\s*>"        # close tag
    r"|(?P<name>[a-zA-Z][^\s/>]*)"             # open tag name
    r"(?P<attrs>(?:\"[^\"]*\"|'[^']*'|[^>])*?)"  # attrs (quotes may hold >)
    r"(?P<selfclose>/?)>"
    r")",
    re.S,
)
_ATTR_RE = re.compile(
    r"([^\s=/>]+)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
)
# raw-text elements: content is literal until the matching close tag.
# The close-tag search must require a name BOUNDARY (</script followed by
# whitespace, '/', or '>') — a bare prefix find would close on </scripty>
# and leak script text into extracted content; case-insensitive regex also
# avoids lowercasing the whole remaining document per rawtext element.
_RAWTEXT_TAGS = frozenset(("script", "style", "textarea", "title"))
_RAWTEXT_CLOSE = {
    t: re.compile(rf"</{t}(?=[\s/>])", re.IGNORECASE) for t in _RAWTEXT_TAGS
}
# attrs tail that is "= then an unquoted value run": the only position where
# a trailing '/' belongs to the value instead of self-closing the tag
_UNQUOTED_VALUE_TAIL = re.compile(r"=\s*[^\s\"'>=]*$")


def _unescape(text: str) -> str:
    import html as _h

    return _h.unescape(text) if "&" in text else text


def _parse_attrs(raw: str) -> dict:
    if not raw or not raw.strip():
        return {}
    attrs = {}
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2) or ""
        if val[:1] in ("'", '"'):
            val = val[1:-1]
        attrs[name] = _unescape(val)
    return attrs


def parse_html(html: str) -> Node:
    root = Node("#root", {}, [])
    stack = [root]

    pos, n = 0, len(html)
    while pos < n:
        m = _TAG_RE.search(html, pos)
        if m is None:
            if pos < n:
                stack[-1].children.append(_unescape(html[pos:]))
            break
        if m.start() > pos:
            stack[-1].children.append(_unescape(html[pos : m.start()]))
        pos = m.end()
        name = m.group("name")
        if name is not None:
            tag = name.lower()
            closers = _ALL_CLOSERS.get(tag)
            if closers:
                while len(stack) > 1 and stack[-1].tag in closers:
                    del stack[-1]
            attrs_raw = m.group("attrs")
            selfclose = m.group("selfclose")
            if selfclose and attrs_raw and _UNQUOTED_VALUE_TAIL.search(attrs_raw):
                # HTML5: a '/' at the end of an UNQUOTED attribute value is
                # part of the value (<a href=/x/> is NOT self-closing), but
                # after a BARE attribute name (<a rel/>) or a quoted value
                # the '/' does self-close — demote only when the attrs tail
                # is an '=' followed by a quote-free value run
                attrs_raw += "/"
                selfclose = ""
            node = Node(tag, _parse_attrs(attrs_raw), [])
            stack[-1].children.append(node)
            if selfclose or tag in VOID_TAGS:
                continue
            if tag in _RAWTEXT_TAGS:
                # literal content until the matching close tag (boundary-
                # checked, case-insensitive — see _RAWTEXT_CLOSE note)
                m2 = _RAWTEXT_CLOSE[tag].search(html, pos)
                if m2 is None:
                    node.children.append(html[pos:])
                    pos = n
                else:
                    node.children.append(html[pos : m2.start()])
                    gt = html.find(">", m2.end())
                    pos = n if gt == -1 else gt + 1
                continue
            stack.append(node)
        elif m.group("close") is not None:
            tag = m.group("close").lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            # unmatched </tag>: ignore
        # comments / declarations / PIs: skipped
    return root


# -------------------------------------------------------- boilerplate strip


def _is_boiler_node(node: Node) -> bool:
    if node.tag in DROP_TAGS or node.tag in LANDMARK_TAGS:
        return True
    attr_text = f"{node.attrs.get('class', '')} {node.attrs.get('id', '')}"
    role = node.attrs.get("role", "")
    if role in ("navigation", "banner", "contentinfo", "complementary"):
        return True
    return bool(_BOILER_ATTR.search(attr_text))


def _norm(text: str) -> str:
    return " ".join(text.split())


def _inline_text(node, parts: list[str], link_chars: list[int], in_link: bool):
    """Flatten a subtree to text, counting characters inside <a> subtrees."""
    if isinstance(node, str):
        parts.append(node)
        if in_link:
            link_chars[0] += len(node)
        return
    if _is_boiler_node(node):
        return
    if node.tag == "br":
        parts.append(" ")
        return
    inside = in_link or node.tag == "a"
    for ch in node.children:
        _inline_text(ch, parts, link_chars, inside)


def _gather_inline(nodes) -> tuple[str, float, int]:
    """Inline run → (normalized text, link density, word count)."""
    parts: list[str] = []
    link_chars = [0]
    for n in nodes:
        _inline_text(n, parts, link_chars, False)
    raw = "".join(parts)
    text = _norm(raw)
    if not text:
        return "", 0.0, 0
    density = link_chars[0] / max(1, len(raw.strip()))
    return text, density, len(text.split())


def _is_link_list(text: str, density: float, words: int) -> bool:
    return density > LINK_DENSITY_MAX and words < LINK_BLOCK_MAX_WORDS


# ------------------------------------------------------------- table recovery


def _cell_spec(cell: Node) -> tuple[str, int, int, bool]:
    text, _d, _w = _gather_inline(cell.children)

    def _ival(name: str, cap: int) -> int:
        try:
            return min(cap, max(1, int(cell.attrs.get(name, "1"))))
        except ValueError:
            return 1

    return (
        text,
        _ival("colspan", COLSPAN_MAX),
        _ival("rowspan", ROWSPAN_MAX),
        cell.tag == "th",
    )


def _table_rows(table: Node) -> list[list[tuple[str, int, int, bool]]]:
    rows = []

    def walk(node: Node):
        for ch in node.children:
            if not isinstance(ch, Node):
                continue
            if ch.tag == "tr":
                cells = [
                    _cell_spec(c)
                    for c in ch.children
                    if isinstance(c, Node) and c.tag in ("td", "th")
                ]
                if cells:
                    rows.append(cells)
            elif ch.tag in ("thead", "tbody", "tfoot"):
                walk(ch)

    walk(table)
    return rows


def table_to_json(table: Node) -> str | None:
    """``<table>`` → the raster path's golden structure JSON (same shape as
    ``fixtures/generate.py::expected_table_json``): ``columns`` are leaf paths
    (``Group/Leaf`` for colspan-grouped headers), ``headers`` the 2-level
    tree, ``records`` the body rows.  Returns None for tables with no rows
    (layout tables with nothing to say)."""
    rows = _table_rows(table)
    if not rows:
        return None
    # leading all-<th> rows are the header block; the 2-level tree consumes
    # at most 2 of them (extra th-rows are demoted to records, not dropped).
    # A table with no <th> treats its first row as a single header row.
    n_head = 0
    while n_head < len(rows) and all(c[3] for c in rows[n_head]):
        n_head += 1
    n_head = min(max(n_head, 1), 2)
    head_rows, body_rows = rows[:n_head], rows[n_head:]

    headers: list[dict] = []
    col_paths: list[str] = []
    row1 = head_rows[0]
    row2 = head_rows[1] if len(head_rows) > 1 else []
    # column bookkeeping: row2 cells fill, left to right, exactly the column
    # slots NOT occupied by a rowspan≥2 cell of row1 — so a group's children
    # come from the row2 cells under the group's own columns, even when
    # sibling cells omit rowspan (sloppy but common markup)
    row1_cols = []
    occupied: set[int] = set()
    col = 0
    for cell in row1:
        if col >= TABLE_COLS_MAX:
            break  # hostile/degenerate width: truncate, don't burn
        _text, cs, rs, _is_th = cell
        cs = min(cs, TABLE_COLS_MAX - col)
        idxs = list(range(col, col + cs))
        row1_cols.append((cell, cs, idxs))
        if rs >= 2:
            occupied.update(idxs)  # ALL of a rowspan≥2 cell's columns
        col += cs
    row2_map: dict[int, str] = {}
    it2 = iter(row2)
    for c in range(col):
        if c in occupied:
            continue
        try:
            row2_map[c] = next(it2)[0]
        except StopIteration:
            break
    for (text, _colspan, rowspan, _is_th), colspan, idxs in row1_cols:
        subs = [row2_map[c] for c in idxs if c in row2_map]
        if colspan > 1 and row2 and rowspan >= 2:
            # colspan>1 AND rowspan≥2: the cell spans both header rows, so it
            # has no row2 children (its columns are in `occupied`); emit it as
            # a flat multi-column header — one path per column it covers —
            # instead of fabricating empty-named children
            headers.append({"text": text, "children": []})
            col_paths.extend([text] * colspan)
        elif colspan > 1 and row2:
            children = subs + [""] * (colspan - len(subs))  # malformed: pad
            headers.append(
                {"text": text, "children": [{"text": c, "children": []} for c in children]}
            )
            col_paths.extend(f"{text}/{c}" for c in children)
        elif subs:
            # single column with a stacked sub-header (rowspan omitted):
            # a one-child group, path "Top/Sub"
            headers.append(
                {"text": text, "children": [{"text": subs[0], "children": []}]}
            )
            col_paths.append(f"{text}/{subs[0]}")
        else:
            headers.append({"text": text, "children": []})
            col_paths.append(text)
    n_cols = len(col_paths)

    records = []
    for row in body_rows:
        rec = [c[0] for c in row][:n_cols]
        rec += [""] * (n_cols - len(rec))
        records.append(rec)
    return json.dumps(
        {"columns": col_paths, "headers": headers, "records": records},
        ensure_ascii=False,
        separators=(",", ":"),
    )


# ------------------------------------------------------------ main extraction


def _emit(node, out: list[dict], buf: list, mcache: dict):
    """Recursive walk.  ``buf`` accumulates the current implicit inline run
    (bare text / inline tags directly under a container); it flushes into a
    text span whenever a block-level child or subtree end is reached.
    ``mcache`` memoizes _has_media per node so the walk stays O(n) (an
    uncached check re-scans each subtree once per enclosing level —
    quadratic on deeply nested inline markup)."""

    def flush():
        if not buf:
            return
        text, density, words = _gather_inline(buf)
        buf.clear()
        if text and not _is_link_list(text, density, words):
            out.append({"kind": "text", "text": text, "media_ref": ""})

    if isinstance(node, str):
        buf.append(node)
        return
    if _is_boiler_node(node):
        return
    tag = node.tag
    if tag == "img":
        flush()
        src = node.attrs.get("src", "")
        out.append({"kind": "media", "text": "", "media_ref": src})
        return
    if tag == "table":
        flush()
        payload = table_to_json(node)
        if payload is not None:
            out.append({"kind": "table", "text": payload, "media_ref": ""})
        return
    if tag in LEAF_BLOCK_TAGS:
        flush()
        # in-order: text runs split around img/table at ANY depth (an image
        # wrapped in <a>/<span> inside a paragraph must still surface as a
        # media span, in document position — not be dropped or reordered)
        lbuf: list = []

        def lflush():
            if not lbuf:
                return
            t, d, w = _gather_inline(lbuf)
            lbuf.clear()
            if t and not _is_link_list(t, d, w):
                out.append({"kind": "text", "text": t, "media_ref": ""})

        for ch in node.children:
            if isinstance(ch, str) or not _has_media(ch, mcache):
                lbuf.append(ch)
            else:
                lflush()
                _emit(ch, out, lbuf, mcache)
        lflush()
        return
    # containers and unknown elements alike: recurse, folding bare inline
    # runs between block children into implicit text blocks; an inline
    # element hiding an img/table descendant recurses instead (media must
    # not vanish inside a text run)
    for ch in node.children:
        is_inline = isinstance(ch, str) or (
            ch.tag in _INLINE_TAGS and not _has_media(ch, mcache)
        )
        if is_inline:
            buf.append(ch)
        else:
            flush()
            _emit(ch, out, buf, mcache)
    flush()  # a block element is a block boundary: no inline run crosses it


_INLINE_TAGS = frozenset(
    "a b i u em strong span code small sub sup mark abbr time cite q s del "
    "ins kbd samp var bdi br".split()
)


def _has_media(node, cache: dict) -> bool:
    """True when a non-boilerplate img/table exists anywhere in the subtree.
    Memoized by node identity (nodes outlive the cache — same extract call)."""
    if isinstance(node, str):
        return False
    key = id(node)
    v = cache.get(key)
    if v is None:
        if _is_boiler_node(node):
            v = False
        elif node.tag in ("img", "table"):
            v = True
        else:
            v = any(_has_media(c, cache) for c in node.children)
        cache[key] = v
    return v


def extract_main_spans(html: str) -> list[dict]:
    """Raw HTML → ordered main-content spans ``[{kind, text, media_ref}]``.

    Deterministic and pure; offsets are assigned by the caller (the Spark
    assembly renumbers the whole document anyway)."""
    root = parse_html(html)
    out: list[dict] = []
    _emit(root, out, [], {})
    return out


# ------------------------------------------------------------ link harvest

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def normalize_url(href: str, base: str | None = None) -> str:
    """Crawl-frontier URL normalization: resolve ``href`` against ``base``
    (RFC 3986 via stdlib ``urljoin``), lowercase scheme and host, strip the
    scheme's default port and the fragment, default an empty path to ``/``.
    Non-http(s) schemes (mailto:, javascript:, data:) pass through with only
    scheme-lowering + fragment strip; a relative href with no base stays
    relative (fragment-stripped) so callers can still dedup within a site."""
    from urllib.parse import urljoin, urlsplit, urlunsplit

    raw = href.strip()
    joined = urljoin(base, raw) if base else raw
    parts = urlsplit(joined)
    scheme = parts.scheme.lower()
    netloc = parts.netloc
    path = parts.path
    if scheme in ("http", "https") and netloc:
        netloc = netloc.lower()
        dflt = _DEFAULT_PORTS[scheme]
        if netloc.endswith(dflt):
            netloc = netloc[: -len(dflt)]
        if not path:
            path = "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def find_base_href(root) -> str | None:
    """First ``<base href>`` in the document (the only place the walk must
    enter DROP_TAGS: ``<base>`` lives in ``<head>``)."""
    stack = [root]
    while stack:
        node = stack.pop()
        if isinstance(node, str):
            continue
        if node.tag == "base":
            href = node.attrs.get("href")
            if href:
                return href
        stack.extend(reversed(node.children))
    return None


def extract_links(html: str) -> list[dict]:
    """ALL anchors in document order → ``[{href, text, norm}]`` (outlink /
    link-graph harvesting — the crawl-frontier view of a page).  ``norm`` is
    the crawl-ready URL: resolved against the page's ``<base href>`` (when
    present) and normalized by :func:`normalize_url`; ``href`` stays raw.

    Unlike :func:`extract_main_spans` this deliberately KEEPS boilerplate
    regions: nav/footer/related links are exactly what a link graph wants.
    Only never-rendered machinery (``DROP_TAGS`` subtrees: script, style,
    forms, head …) is skipped.  Anchors without an ``href`` attribute are
    not links; text is whitespace-normalized inner text."""
    out: list[dict] = []
    root = parse_html(html)
    base = find_base_href(root)

    def norm_of(href: str) -> str:
        # a single unparseable href (e.g. "http://[::") must not poison the
        # page's other links — degrade to the raw value, still crawl-usable
        try:
            return normalize_url(href, base)
        except ValueError:
            return href

    def walk(node):
        if isinstance(node, str):
            return
        if node.tag in DROP_TAGS:
            return
        if node.tag == "a" and "href" in node.attrs:
            parts: list[str] = []

            def text_of(ch):
                # DROP_TAGS only — the boilerplate class filter must NOT
                # eat visible anchor text (a nav anchor wrapping a classed
                # span is still a rendered label)
                if isinstance(ch, str):
                    parts.append(ch)
                    return
                if ch.tag in DROP_TAGS:
                    return
                for c in ch.children:
                    text_of(c)

            for ch in node.children:
                text_of(ch)
            href = node.attrs["href"]
            out.append(
                {"href": href, "text": _norm("".join(parts)), "norm": norm_of(href)}
            )
            return  # the parser implies </a> before a new <a>: never nested
        for ch in node.children:
            walk(ch)

    walk(root)
    return out
