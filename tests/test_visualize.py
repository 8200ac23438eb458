"""kernel/visualize: box overlay drawing (the reference's visualize_* parity)."""

import numpy as np

from tableextraction_spark.kernel.visualize import BOX_INK, annotate_page, draw_boxes


def test_draw_boxes_borders_only():
    page = np.full((20, 30), 255, dtype=np.uint8)
    out = draw_boxes(page, [(5, 4, 14, 12)])
    assert page[4, 5] == 255  # input untouched (copy semantics)
    # border pixels painted
    assert out[4, 5] == BOX_INK and out[4, 14] == BOX_INK
    assert out[12, 5] == BOX_INK and out[8, 14] == BOX_INK
    # interior untouched
    assert out[8, 9] == 255


def test_draw_boxes_clips_out_of_page():
    page = np.full((10, 10), 255, dtype=np.uint8)
    out = draw_boxes(page, [(-5, -5, 25, 25), (8, 8, 3, 3)])  # huge + inverted
    assert out[0, 0] == BOX_INK  # clipped corner drawn
    assert out.shape == page.shape


def test_annotate_page_marks_detected_grid():
    from tableextraction_spark.fixtures.generate import gen_doc
    from tableextraction_spark.media import decode_page

    # first media page of the deterministic corpus that contains a table
    for doc_no in range(6):
        blobs = gen_doc(doc_no)[1]
        for b in blobs:
            gray = decode_page(b["content"])
            out = annotate_page(gray)
            if (out == BOX_INK).any():
                assert out.shape == gray.shape
                assert (out == BOX_INK).sum() > 40  # a real rectangle, not noise
                return
    raise AssertionError("no table detected on any fixture page")
