"""Native JPEG 2000 backend seam (jp2._native_jp2_decoder).

The from-scratch tier-1 decoder is the correctness reference; the native
backend (Pillow+OpenJPEG) is the deploy-time fast path.  When the lib is
importable the two must agree bit-for-bit on fixture pages; when it is not
(this container), the probe must cleanly report unavailable and decode_jp2
must keep working through the from-scratch path.  TABLEX_JP2_NATIVE=0 must
force the from-scratch path even when the lib exists.
"""

import numpy as np
import pytest

import tableextraction_spark.jp2 as jp2
from tableextraction_spark.fixtures.generate import gen_doc


def _have_native() -> bool:
    try:
        from PIL import features

        return bool(features.check("jpg_2000"))
    except Exception:
        return False


def _fresh_probe(monkeypatch, env: str | None = None):
    monkeypatch.setattr(jp2, "_NATIVE_JP2", None)
    if env is not None:
        monkeypatch.setenv("TABLEX_JP2_NATIVE", env)


def test_probe_is_false_not_crash_when_lib_absent(monkeypatch):
    _fresh_probe(monkeypatch)
    got = jp2._native_jp2_decoder()
    if _have_native():
        assert callable(got)
    else:
        assert got is False
    # probe result is memoized — second call returns the same object
    assert jp2._native_jp2_decoder() is got


def test_env_kill_switch_forces_from_scratch(monkeypatch):
    _fresh_probe(monkeypatch, env="0")
    assert jp2._native_jp2_decoder() is False
    blob = gen_doc(3, codec="jp2")[1][0]["content"]
    img = jp2.decode_jp2(blob)  # from-scratch path still decodes
    assert img.ndim == 2 and img.dtype == np.uint8


def test_decode_jp2_still_rejects_garbage_before_native_dispatch(monkeypatch):
    _fresh_probe(monkeypatch)
    with pytest.raises(ValueError, match="neither"):
        jp2.decode_jp2(b"\x00" * 64)
    with pytest.raises(ValueError, match="truncated"):
        jp2.decode_jp2(b"\xff")


def test_native_failure_falls_back_to_from_scratch(monkeypatch):
    """A native backend that balks on a valid stream must not fail the
    row — the from-scratch decoder is the behavior of record."""
    blob = gen_doc(3, codec="jp2")[1][0]["content"]
    want = jp2.decode_jp2(blob)

    def _balky(data):
        raise RuntimeError("simulated native decoder failure")

    monkeypatch.setattr(jp2, "_NATIVE_JP2", _balky)
    got = jp2.decode_jp2(blob)
    assert np.array_equal(got, want)


@pytest.mark.skipif(not _have_native(), reason="Pillow+OpenJPEG not in env")
def test_native_bit_equals_from_scratch(monkeypatch):
    """Deploy-time gate: both backends decode the same pixels."""
    for dn in (0, 3, 9):
        blob = gen_doc(dn, codec="jp2")[1][0]["content"]
        _fresh_probe(monkeypatch, env="0")
        scratch = jp2.decode_jp2(blob)
        _fresh_probe(monkeypatch, env="1")
        native = jp2.decode_jp2(blob)
        assert np.array_equal(np.squeeze(native), np.squeeze(scratch))
