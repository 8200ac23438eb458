"""Pluggable OCR strategies (SURVEY §7.8).

The reference OCRs cell crops with EasyOCR (``table_extraction/
recognition.py:167-238``); fixtures use the deterministic template decoder
(``font.decode_text``).  Both are registered here behind one batched
contract so the decode stage is strategy-agnostic:

    strategy(crops: list[np.ndarray]) -> list[str]     # one text per crop

Selection: ``resolve_ocr(name)`` or the ``TABLEX_OCR`` environment variable
(default ``template``).  On a cluster, set it per executor —
``spark.conf.set("spark.executorEnv.TABLEX_OCR", "easyocr")`` — because the
strategy is resolved inside the UDF at task time, not pickled from the
driver.

The EasyOCR adapter is import-guarded (the library is not in this
container) and holds the reader as a **per-executor module singleton**,
initialized once per Python worker — the reference re-creates the reader
per document (``recognition.py:195-199``) and re-loads models per call
(``detection.py:104-109``), the §4.1 anti-patterns this engine must not
copy.  Cell batching follows the reference's ``batch_size=16``
(``recognition.py:27``); the empty-crop guard mirrors ``recognition.py:227``.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import numpy as np

from .font import decode_text

OcrFn = Callable[[list[np.ndarray]], list[str]]

ENV_VAR = "TABLEX_OCR"
EASYOCR_LANGS = ["en", "ru"]  # recognition.py:195-199
EASYOCR_BATCH = 16            # recognition.py:27


def _template_batch(crops: list[np.ndarray]) -> list[str]:
    """Exact template OCR over the fixture glyph atlas (deterministic)."""
    return [decode_text(c) if c.size else "" for c in crops]


_easyocr_reader = None  # per-executor singleton


def _easyocr_batch(crops: list[np.ndarray]) -> list[str]:
    global _easyocr_reader
    if _easyocr_reader is None:
        import easyocr  # type: ignore[import-not-found]

        _easyocr_reader = easyocr.Reader(EASYOCR_LANGS, gpu=False)
    out = []
    for crop in crops:
        if crop.size == 0:  # empty-cell guard, recognition.py:227
            out.append("")
            continue
        dets = _easyocr_reader.readtext(crop, batch_size=EASYOCR_BATCH)
        # concat detections left-to-right with spaces (recognition.py:31-34)
        out.append(" ".join(d[1] for d in dets).strip())
    return out


def _easyocr_available() -> bool:
    try:
        import easyocr  # type: ignore[import-not-found]  # noqa: F401

        return True
    except ImportError:
        return False


_STRATEGIES: dict[str, OcrFn] = {
    "template": _template_batch,
    "easyocr": _easyocr_batch,
}


def register_ocr(name: str, fn: OcrFn) -> None:
    """Register a custom OCR strategy (e.g. a cloud OCR adapter)."""
    _STRATEGIES[name] = fn


def resolve_ocr(name: str | None = None) -> OcrFn:
    """Strategy name (or $TABLEX_OCR, default 'template') → batched OCR fn.

    'easyocr' fails loud at resolve time when the library is missing, so a
    misconfigured job dies at stage start, not per row mid-corpus.
    """
    name = name or os.environ.get(ENV_VAR, "template")
    if name not in _STRATEGIES:
        raise KeyError(
            f"unknown OCR strategy {name!r}; registered: {sorted(_STRATEGIES)}"
        )
    if name == "easyocr" and not _easyocr_available():
        raise RuntimeError(
            "OCR strategy 'easyocr' requires the easyocr package "
            "(pip install easyocr), not present in this container"
        )
    return _STRATEGIES[name]
