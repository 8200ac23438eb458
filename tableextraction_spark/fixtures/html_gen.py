"""Deterministic HTML-document fixture family with plan-derived goldens.

Mirrors `fixtures/generate.py` for the HTML side of the north rule ("HTML
boilerplate strip … DOM heuristics"): every document is a pure function of
(HSEED, doc_num); the *plan* fixes the main content (paragraphs, headings,
lists, tables — the same `_plan_table` structures the raster pages use — and
images), the *renderer* wraps it in realistic boilerplate chrome (nav/header,
cookie banner, sidebar ads, footers, script/style, link-lists, breadcrumbs)
plus markup noise (whitespace jitter, inline tags, entities), and the golden
output spans are computed from the plan alone — independent of the parser in
`htmlx.py`.

Every boilerplate chunk contains the sentinel token ``zzboilerzz``; since no
plan-derived content word ever contains it, "no sentinel in any output span"
is a machine-checkable no-leak property (queries/htmlops.py q39).

Input-doc shape matches BASELINE.json's input_hint: the raw page HTML rides
in a span of kind ``html`` (text = markup); the extraction pipeline replaces
it with the extracted main-content spans, renumbering offsets.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pandas as pd

from .generate import VOCAB, _plan_table, _word, expected_table_json

HSEED = 7117
SENTINEL = "zzboilerzz"


def _rng(*key: int) -> np.random.Generator:
    return np.random.default_rng([HSEED, *key])


# ---------------------------------------------------------------- plan


def plan_html_doc(doc_num: int) -> dict:
    rng = _rng(doc_num)
    n_blocks = int(rng.integers(4, 11))
    blocks = []
    for b in range(n_blocks):
        r = rng.random()
        if r >= 0.93 and blocks and blocks[-1]["kind"] == "bare":
            # two adjacent bare inline runs are ONE block in HTML semantics
            # (only whitespace between them) — keep plan and DOM in agreement
            r = 0.0
        if r < 0.40:
            words = [_word(rng) for _ in range(int(rng.integers(6, 30)))]
            if rng.random() < 0.25:  # entity round-trip: &amp; → &
                words[int(rng.integers(0, len(words)))] = "R&D"
            blocks.append({"kind": "p", "words": words})
        elif r < 0.55:
            blocks.append({"kind": "h", "words": [_word(rng) for _ in range(int(rng.integers(1, 4)))]})
        elif r < 0.70:
            items = [
                [_word(rng) for _ in range(int(rng.integers(2, 7)))]
                for _ in range(int(rng.integers(2, 5)))
            ]
            blocks.append({"kind": "list", "items": items})
        elif r < 0.85:
            blocks.append({"kind": "table", "tp": _plan_table(rng)})
        elif r < 0.93:
            blocks.append({"kind": "img", "ref": f"h-{doc_num:06d}-i{b}"})
        else:
            blocks.append({"kind": "bare", "words": [_word(rng) for _ in range(int(rng.integers(3, 9)))]})
    intro = [_word(rng) for _ in range(int(rng.integers(3, 8)))] if rng.random() < 0.35 else None
    tail = [_word(rng) for _ in range(int(rng.integers(3, 8)))] if rng.random() < 0.35 else None
    return {
        "doc_id": f"hdoc-{doc_num:06d}",
        "blocks": blocks,
        "intro": intro,
        "tail": tail,
    }


def expected_block_spans(plan: dict) -> list[dict]:
    """Golden main-content spans for the html payload, from the plan alone."""
    out = []

    def push(kind, text, ref=""):
        out.append({"kind": kind, "text": text, "media_ref": ref})

    for blk in plan["blocks"]:
        k = blk["kind"]
        if k in ("p", "h", "bare"):
            push("text", " ".join(blk["words"]))
        elif k == "list":
            for item in blk["items"]:
                push("text", " ".join(item))
        elif k == "table":
            push("table", expected_table_json(blk["tp"]))
        elif k == "img":
            push("media", "", blk["ref"])
    return out


# ---------------------------------------------------------------- renderer

_BOILER_WORDS = f"{SENTINEL} home {SENTINEL} archive {SENTINEL} contact".split()


def _esc(text: str) -> str:
    return _html.escape(text, quote=False)


def _jitter_join(words: list[str], rng, links: list | None = None) -> str:
    """Escape + join with whitespace noise and inline-markup noise; the
    normalized text is exactly ``" ".join(words)``.  When ``links`` is
    given, every anchor rendered is RECORDED into it (href, text) — pure
    recording, the rng draw stream is untouched."""
    seps = [" ", "  ", "\n", "\n    ", " \t "]
    # at most ONE in-prose link, and only in long blocks (≥12 words): the
    # linked block must stay far below the 0.5 density / 25-word strip rule
    link_at = int(rng.integers(0, len(words))) if (
        len(words) >= 12 and rng.random() < 0.3
    ) else -1
    parts = []
    for i, w in enumerate(words):
        e = _esc(w)
        r = rng.random()
        if i == link_at:
            if links is not None:
                links.append((f"/w/{i}", w))
            e = f'<a href="/w/{i}">{e}</a>'
        elif r < 0.06:
            e = f"<b>{e}</b>"
        elif r < 0.12:
            e = f"<em>{e}</em>"
        elif r < 0.16:
            e = f'<span class="hl">{e}</span>'
        parts.append(e)
        if i < len(words) - 1:
            parts.append(seps[int(rng.integers(0, len(seps)))])
    return "".join(parts)


def _render_table(tp: dict, rng) -> str:
    group = tp["group"]
    out = ["<table>", "<thead>"]
    if group:
        gs, gn, gtext = group
        row1 = []
        for c in range(tp["n_cols"]):
            if c == gs:
                row1.append(f'<th colspan="{gn}">{_esc(gtext)}</th>')
            elif gs < c < gs + gn:
                continue
            else:
                row1.append(f'<th rowspan="2">{_esc(tp["headers"][c])}</th>')
        out.append("<tr>" + "".join(row1) + "</tr>")
        out.append(
            "<tr>"
            + "".join(f"<th>{_esc(tp['headers'][c])}</th>" for c in range(gs, gs + gn))
            + "</tr>"
        )
    else:
        out.append(
            "<tr>" + "".join(f"<th>{_esc(h)}</th>" for h in tp["headers"]) + "</tr>"
        )
    out.append("</thead><tbody>")
    for row in tp["records"]:
        out.append(
            "<tr>" + "".join(f"<td> {_esc(c['clean'])} </td>" for c in row) + "</tr>"
        )
    out.append("</tbody></table>")
    return "\n".join(out)


def page_base(doc_num: int) -> str | None:
    """Deterministic messy ``<base href>`` for 2 of 3 docs — mixed-case
    scheme/host plus the explicit default port, so normalization has real
    work to do.  ``None`` for the rest: relative hrefs must also survive
    un-resolved (within-site dedup still works on them)."""
    if doc_num % 3 == 0:
        return None
    return f"HTTPS://Ex{doc_num:06d}.Example.COM:443/sub/dir/index.html"


# Fixed (rng-free) footer anchors exercising the normalization surface: the
# first two are DISTINCT raw hrefs with the SAME normalized URL (frontier
# dedup must collapse them), the third resolves ../ against <base>, the
# fourth is a non-http scheme that passes through.
_NORM_PROBE_LINKS = [
    ("HTTP://Other.Example.ORG:80/path/?q=1#frag", f"{SENTINEL} ext"),
    ("http://other.example.org/path/?q=1", f"{SENTINEL} ext2"),
    ("../up/page.html#sec", f"{SENTINEL} rel"),
    ("mailto:Contact@Example.com", f"{SENTINEL} mail"),
]


def _expected_norm(href: str, base: str | None) -> str:
    """Fixture-side normalization oracle — intentionally re-derived with
    string partitioning rather than calling ``htmlx.normalize_url`` (whose
    urlsplit/urlunsplit path this differentially checks).  Resolution itself
    is stdlib ``urljoin`` on both sides: RFC 3986 reference, not under test."""
    from urllib.parse import urljoin

    u = urljoin(base, href.strip()) if base else href.strip()
    u = u.split("#", 1)[0]
    scheme, sep, rest = u.partition("://")
    if sep and scheme.lower() in ("http", "https"):
        slash = rest.find("/")
        host, path = (rest, "") if slash < 0 else (rest[:slash], rest[slash:])
        query = ""
        if "?" in path:
            path, _, q = path.partition("?")
            query = "?" + q
        elif "?" in host:
            host, _, q = host.partition("?")
            query = "?" + q
        host = host.lower()
        dflt = ":80" if scheme.lower() == "http" else ":443"
        if host.endswith(dflt):
            host = host[: -len(dflt)]
        return f"{scheme.lower()}://{host}{path or '/'}{query}"
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*):", u)
    if m:
        return m.group(1).lower() + ":" + u[m.end():]
    return u


def _boiler_chrome(rng, base_tag: str = "") -> tuple[str, str, list, list, list]:
    """(prefix, suffix, mid-content interrupts, prefix links, suffix links)
    — all sentinel-bearing; interrupts are (html, links) pairs so link
    goldens preserve document order after splicing."""
    pre_links: list = []
    nav_parts = []
    for i in range(int(rng.integers(3, 7))):
        w = _word(rng)
        pre_links.append((f"/{i}", f"{SENTINEL} {w}"))
        nav_parts.append(f'<li><a href="/{i}">{SENTINEL} {w}</a></li>')
    nav_links = "".join(nav_parts)
    nav = (
        f'<nav><ul>{nav_links}</ul></nav>'
        if rng.random() < 0.6
        else f'<div role="navigation"><ul>{nav_links}</ul></div>'
    )
    head = (
        f"<head><title>{SENTINEL} title</title>{base_tag}"
        f"<style>p {{ margin: 0 }} /* {SENTINEL} */</style>"
        f'<script>var t = "{SENTINEL}";</script></head>'
    )
    cookie = (
        f'<div class="cookie-consent">{SENTINEL} we use cookies '
        f'<button>OK</button></div>'
        if rng.random() < 0.5
        else ""
    )
    crumbs = ""
    if rng.random() < 0.5:
        crumbs = (
            f'<div class="breadcrumbs"><a href="/">{SENTINEL}</a> &gt; '
            f'<a href="/x">{SENTINEL}</a></div>'
        )
        pre_links.extend([("/", SENTINEL), ("/x", SENTINEL)])
    header = f'<header class="site-header"><h1>{SENTINEL} site</h1>{nav}</header>'
    prefix = f"<html>{head}<body>{header}{cookie}{crumbs}"
    aside = (
        f'<aside class="sidebar"><p>{SENTINEL} subscribe</p>'
        f'<div class="ad-slot">{SENTINEL} buy now</div></aside>'
    )
    footer = (
        f'<footer><p>{SENTINEL} © 2026</p><ul>'
        + "".join(f'<li><a href="/f{i}">{SENTINEL}</a></li>' for i in range(3))
        + "".join(f'<li><a href="{h}">{_esc(t)}</a></li>' for h, t in _NORM_PROBE_LINKS)
        + "</ul></footer>"
    )
    suf_links = [(f"/f{i}", SENTINEL) for i in range(3)] + list(_NORM_PROBE_LINKS)
    suffix = f"{aside}{footer}</body></html>"
    interrupts: list = []
    if rng.random() < 0.6:  # in-flow ad block: class-vocabulary strip
        interrupts.append(
            (f'<div class="advert-box">{SENTINEL} {_word(rng)}</div>', [])
        )
    if rng.random() < 0.6:  # neutral class, pure link list: density strip
        lparts, llinks = [], []
        for i in range(int(rng.integers(2, 5))):
            w = _word(rng)
            llinks.append((f"/r{i}", f"{SENTINEL} {w}"))
            lparts.append(f'<a href="/r{i}">{SENTINEL} {w}</a>')
        interrupts.append((f'<div class="extra">{" · ".join(lparts)}</div>', llinks))
    return prefix, suffix, interrupts, pre_links, suf_links


def render_html_doc(plan: dict, doc_num: int, links_out: list | None = None) -> str:
    """Plan → full HTML page (separate jitter stream, like generate.py).

    ``links_out`` (when given) receives every rendered anchor as
    ``(href, normalized text)`` in document order — the golden for
    :func:`tableextraction_spark.htmlx.extract_links`.  Recording only:
    the rng stream and the rendered bytes are identical either way."""
    rng = _rng(doc_num, 1)
    base = page_base(doc_num)
    base_tag = f'<base href="{base}">' if base else ""
    prefix, suffix, interrupts, pre_links, suf_links = _boiler_chrome(rng, base_tag)
    body: list = []  # (html, links) per block
    hl = int(rng.integers(2, 5))
    for blk in plan["blocks"]:
        k = blk["kind"]
        blinks: list = []
        if k == "p":
            body.append((f"<p>{_jitter_join(blk['words'], rng, blinks)}</p>", blinks))
        elif k == "h":
            body.append(
                (f"<h{hl}>{_jitter_join(blk['words'], rng, blinks)}</h{hl}>", blinks)
            )
        elif k == "list":
            tag = "ul" if rng.random() < 0.7 else "ol"
            lis = "".join(
                f"<li>{_jitter_join(it, rng, blinks)}</li>" for it in blk["items"]
            )
            body.append((f"<{tag}>{lis}</{tag}>", blinks))
        elif k == "table":
            body.append((_render_table(blk["tp"], rng), []))
        elif k == "img":
            body.append((f'<img src="{blk["ref"]}" alt="figure">', []))
        elif k == "bare":
            body.append((_jitter_join(blk["words"], rng, blinks), blinks))
    # splice boilerplate interrupts between blocks (never inside one)
    for chunk in interrupts:
        pos = int(rng.integers(0, len(body) + 1))
        body.insert(pos, chunk)
    wrap = rng.random()
    content = "\n".join(h for h, _l in body)
    if wrap < 0.5:
        content = f'<main id="content">{content}</main>'
    elif wrap < 0.8:
        content = f'<article class="post">{content}</article>'
    else:
        content = f'<div id="story-body">{content}</div>'
    if links_out is not None:
        links_out.extend(pre_links)
        for _h, blinks in body:
            links_out.extend(blinks)
        links_out.extend(suf_links)
    return f"{prefix}{content}{suffix}"


def expected_links(doc_num: int) -> list[dict]:
    """Golden outlinks for one fixture doc: every rendered anchor, in
    document order, as ``{href, text, norm}`` (renderer-derived; the parser
    under test never sees this path — ``norm`` comes from the independent
    :func:`_expected_norm` oracle, not from ``htmlx.normalize_url``)."""
    links: list = []
    render_html_doc(plan_html_doc(doc_num), doc_num, links_out=links)
    base = page_base(doc_num)
    return [
        {"href": h, "text": t, "norm": _expected_norm(h, base)} for h, t in links
    ]


# ---------------------------------------------------------------- corpus


def gen_html_doc(doc_num: int) -> tuple[dict, dict]:
    """doc_num → (input doc_row, golden expected_row), both
    ``{doc_id, spans:[{kind,text,media_ref,offset}]}``."""
    plan = plan_html_doc(doc_num)
    doc_id = plan["doc_id"]
    in_spans, out_spans = [], []

    def push(spans, kind, text, ref=""):
        spans.append({"kind": kind, "text": text, "media_ref": ref, "offset": len(spans)})

    if plan["intro"]:
        t = " ".join(plan["intro"])
        push(in_spans, "text", t)
        push(out_spans, "text", t)
    push(in_spans, "html", render_html_doc(plan, doc_num))
    for s in expected_block_spans(plan):
        push(out_spans, s["kind"], s["text"], s["media_ref"])
    if plan["tail"]:
        t = " ".join(plan["tail"])
        push(in_spans, "text", t)
        push(out_spans, "text", t)
    return (
        {"doc_id": doc_id, "spans": in_spans},
        {"doc_id": doc_id, "spans": out_spans},
    )


# ------------------------------------------------- distributed materialization


def html_docs_dataframe(spark, n_docs: int, parts: int | None = None):
    """Input docs table (doc_id, spans) generated inside Spark tasks."""
    from ..pipeline import DOCS_SCHEMA

    parts = parts or min(n_docs, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [gen_html_doc(int(i))[0] for i in pdf["id"]]
            yield pd.DataFrame(
                {"doc_id": [r["doc_id"] for r in rows], "spans": [r["spans"] for r in rows]}
            )

    return spark.range(n_docs).repartition(parts).mapInPandas(gen, DOCS_SCHEMA)


def html_expected_dataframe(spark, n_docs: int, parts: int | None = None):
    """Golden output spans (plan-derived, independent of htmlx.py)."""
    from ..pipeline import DOCS_SCHEMA

    parts = parts or min(n_docs, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [gen_html_doc(int(i))[1] for i in pdf["id"]]
            yield pd.DataFrame(
                {"doc_id": [r["doc_id"] for r in rows], "spans": [r["spans"] for r in rows]}
            )

    return spark.range(n_docs).repartition(parts).mapInPandas(gen, DOCS_SCHEMA)


def html_expected_links_dataframe(spark, n_docs: int, parts: int | None = None):
    """Golden outlinks table (doc_id, link_no, href, text), renderer-derived
    and materialized inside Spark tasks — sibling of html_expected_dataframe;
    doc ids come from the plan, never rebuilt by hand."""
    parts = parts or min(n_docs, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                doc_id = plan_html_doc(int(i))["doc_id"]
                base = page_base(int(i))
                for j, ln in enumerate(expected_links(int(i))):
                    rows.append(
                        (doc_id, j, ln["href"],
                         _expected_norm(ln["href"], base), ln["text"])
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "link_no", "href", "norm", "text"]
            )

    return spark.range(n_docs).repartition(parts).mapInPandas(
        gen, "doc_id string, link_no int, href string, norm string, text string"
    )
