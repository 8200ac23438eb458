"""Winnowing guarantee (Schleimer et al. SIGMOD'03): documents sharing a
long-enough word run must share at least one fingerprint hash — the property
that makes q27 a sound candidate generator for near-dup detection."""

import random

import pytest

from tableextraction_spark.queries.textops import WINNOW_W, q27_winnow_fingerprint

# shared word run of SHINGLE_K + WINNOW_W - 1 words → WINNOW_W consecutive
# shared shingles → one full shared window → identical window-min
SHINGLE_K = 3
GUARANTEE_WORDS = SHINGLE_K + WINNOW_W - 1


def _rand_words(rng, n):
    return [f"w{rng.randrange(5000)}" for _ in range(n)]


@pytest.fixture(scope="module")
def fingerprints(spark, tmp_path_factory):
    rng = random.Random(7)
    shared = " ".join(_rand_words(rng, GUARANTEE_WORDS + 2))
    rows = []
    for i in range(20):
        prefix = " ".join(_rand_words(rng, rng.randrange(0, 40)))
        suffix = " ".join(_rand_words(rng, rng.randrange(0, 40)))
        rows.append((i, f"{prefix} {shared} {suffix}".strip(), "en", "synth", 0))
    # two unrelated docs as the negative control
    rows.append((100, " ".join(_rand_words(rng, 60)), "en", "synth", 0))
    rows.append((101, " ".join(_rand_words(rng, 60)), "en", "synth", 0))
    sf_dir = str(tmp_path_factory.mktemp("winnow"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    out = q27_winnow_fingerprint(spark, sf_dir).collect()
    return {r.doc_id: set(r.fp.split(",")) for r in out}


def test_shared_run_implies_shared_fingerprint(fingerprints):
    sharing = [fingerprints[i] for i in range(20)]
    common = set.intersection(*sharing)
    assert common, "docs sharing a full window-length word run must overlap"


def test_unrelated_docs_no_guaranteed_overlap(fingerprints):
    # sanity: the property is about shared runs, not universal collisions —
    # with 5000-word vocab and 60-word docs, unrelated fingerprints are
    # (overwhelmingly) disjoint for this fixed seed
    assert not (fingerprints[100] & fingerprints[101])


def test_label_propagation_equals_connected_components():
    """q33's bounded min-label propagation must equal true connected
    components whenever cluster diameter <= LP_ITERS — property-checked on
    random pair graphs against a BFS reference."""
    import numpy as np

    from tableextraction_spark.queries.pipelineops import LP_ITERS

    rng = np.random.default_rng(23)
    for _trial in range(200):
        n = int(rng.integers(2, 14))
        # random sparse pair set (near-dup graphs are sparse)
        m = int(rng.integers(0, n + 3))
        pairs = {
            tuple(sorted(rng.choice(n, size=2, replace=False).tolist()))
            for _ in range(m)
        }
        if not pairs:
            continue
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        verts = sorted(adj)
        # BFS ground truth: min vertex per component, with diameter
        comp_of, diam_ok = {}, True
        for v in verts:
            if v in comp_of:
                continue
            seen, frontier, depth = {v}, {v}, 0
            while frontier:
                frontier = {u for x in frontier for u in adj[x]} - seen
                seen |= frontier
                if frontier:
                    depth += 1
            for u in seen:
                comp_of[u] = min(seen)
            if depth > LP_ITERS:
                diam_ok = False
        # the algorithm under test (mirrors the Spark/SQL passes exactly)
        lab = {v: v for v in verts}
        for _ in range(LP_ITERS):
            lab = {
                v: min([lab[v]] + [lab[u] for u in adj[v]]) for v in verts
            }
        if diam_ok:
            assert lab == comp_of
        else:
            # bounded passes may under-merge, but labels never cross
            # component boundaries
            for v in verts:
                assert comp_of[lab[v]] == comp_of[v]
