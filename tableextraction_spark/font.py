"""Deterministic bitmap glyph atlas for the synthetic renderer + template OCR.

The reference OCRs real scans with EasyOCR (langs ``['en','ru']``,
``table_extraction/recognition.py:195-199``) — model weights that cannot live
in a reproducible fixture.  Following SURVEY.md §7(e), OCR is a pluggable
strategy; the fixture-path decoder is an exact template matcher over a glyph
atlas that the synthetic renderer also uses, so recognition is deterministic
and the span-equality invariant is machine-checkable.

Each supported character maps to a unique 5×7 bit pattern derived from
``md5(char)`` (stable across platforms/python versions).  Uniqueness over the
whole alphabet is asserted at import.  The alphabet covers ASCII letters,
digits, a few punctuation marks, and a set of Cyrillic letters (the reference
is an EN+RU pipeline).
"""

from __future__ import annotations

import hashlib

import numpy as np

GLYPH_W = 5
GLYPH_H = 7
ADVANCE = GLYPH_W + 1  # 1px inter-glyph spacing
LINE_H = GLYPH_H + 2

ALPHABET = (
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789"
    ".,-%()/:"
    "абвгдежзийклмнопрстуфхцчшщъыьэюяё"
    "АБВГДЕЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯЁ"
)


def _glyph_bits(ch: str) -> np.ndarray:
    """char → 5×7 bool array from md5 bits; guaranteed non-empty."""
    digest = hashlib.md5(ch.encode("utf-8")).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_W * GLYPH_H]
    g = bits.reshape(GLYPH_H, GLYPH_W).astype(bool)
    if not g.any():  # pragma: no cover — md5 of 1 char never all-zero in 35 bits
        g[0, 0] = True
    # force the corner rows/cols to carry at least one pixel so every glyph's
    # tight bounding box is exactly 5×7 → the decoder can segment by fixed
    # advance from the text block origin.
    g[0, 0] = True
    g[GLYPH_H - 1, GLYPH_W - 1] = True
    return g


GLYPHS: dict[str, np.ndarray] = {ch: _glyph_bits(ch) for ch in ALPHABET}

# reverse index: the 35 glyph bits packed into one int → char.  One integer
# key per slot lets the decoder turn a whole text line into keys with a
# single matrix multiply instead of per-slot tobytes() hashing.
_POW = (1 << np.arange(GLYPH_W * GLYPH_H, dtype=np.uint64))
_PATTERNS: dict[int, str] = {
    int(g.reshape(-1).astype(np.uint64) @ _POW): ch for ch, g in GLYPHS.items()
}
if len(_PATTERNS) != len(ALPHABET):  # pragma: no cover
    raise AssertionError("glyph pattern collision — alphabet not decodable")


def render_text(canvas: np.ndarray, x: int, y: int, text: str) -> int:
    """Draw ``text`` onto uint8 ``canvas`` (ink=0) at top-left (x, y).

    Spaces advance without ink.  Returns the x coordinate after the last
    glyph.  Out-of-bounds glyphs are clipped silently.
    """
    h, w = canvas.shape
    for ch in text:
        if ch != " ":
            g = GLYPHS.get(ch)
            if g is None:
                raise KeyError(f"char {ch!r} not in fixture alphabet")
            y2, x2 = min(y + GLYPH_H, h), min(x + GLYPH_W, w)
            if y < h and x < w:
                canvas[y:y2, x:x2][g[: y2 - y, : x2 - x]] = 0
        x += ADVANCE
    return x


def text_width(text: str) -> int:
    return len(text) * ADVANCE


def decode_text(crop: np.ndarray) -> str:
    """Exact template OCR of a single-line text block inside ``crop``.

    Finds the tight bounding box of ink, walks fixed-advance glyph slots,
    and looks each 5×7 pattern up in the atlas.  Slots with no ink decode to
    a space; unknown patterns decode to ``?`` (counted as OCR errors
    upstream).  Mirrors the role of ``recognition.osr_detection``
    (reference ``table_extraction/recognition.py:167-238``) on fixture pages.
    """
    ink = crop < 128
    ys, xs = np.nonzero(ink)
    if ys.size == 0:
        return ""
    y0, x0 = ys.min(), xs.min()
    y1, x1 = ys.max(), xs.max()
    if y1 - y0 + 1 > GLYPH_H:  # taller than one glyph line — not fixture text
        return "?"
    n_slots = (x1 - x0 + 1 + ADVANCE - 1) // ADVANCE
    # all slots at once: zero-pad the line region to n_slots full advances,
    # view it as (rows, slot, advance), drop the spacing column, and pack
    # each slot's 35 bits into one integer key (single matvec) — ~3× faster
    # than the per-slot loop this replaces (OCR was 20% of the page kernel)
    region = np.zeros((GLYPH_H, n_slots * ADVANCE), dtype=bool)
    sub = ink[y0 : y0 + GLYPH_H, x0 : x0 + n_slots * ADVANCE]
    region[: sub.shape[0], : sub.shape[1]] = sub
    slots = region.reshape(GLYPH_H, n_slots, ADVANCE)[:, :, :GLYPH_W]
    flat = slots.transpose(1, 0, 2).reshape(n_slots, GLYPH_H * GLYPH_W)
    keys = flat.astype(np.uint64) @ _POW
    out = [
        " " if k == 0 else _PATTERNS.get(int(k), "?") for k in keys
    ]
    return "".join(out).rstrip()
