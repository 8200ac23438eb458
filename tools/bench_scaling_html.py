"""Scaling-efficiency evidence for the HTML main-content path (north rule
N → 4N, evidenced as two parallelism levels on the same input — same
methodology as tools/bench_scaling.py: clean JVM per level, min over
repeats, zero-IPC pool baseline certifying the measurement window).

The html stage is pure-Python DOM parsing inside mapInPandas over a narrow
plan, so it should scale like the raster decode kernel: per-task CPU with
no shared state, only KB span rows reaching the one assembly exchange.

Usage: python tools/bench_scaling_html.py [n_docs] [N] [4N] [reps]
Prints one JSON line; recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from tableextraction_spark.session import get_spark
from bench import ensure_html_corpus
from tableextraction_spark.pipeline import extract_spans

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); reps = int(sys.argv[3])
spark = get_spark(app=f"hscale{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
docs_path = ensure_html_corpus(spark, n_docs)
docs = spark.read.parquet(docs_path)
def consume(df):
    df.write.format("noop").mode("overwrite").save()
consume(extract_spans(spark, docs.limit(64), None, html=True))  # warm workers
best = None
for _ in range(reps):
    t0 = time.time(); consume(extract_spans(spark, docs, None, html=True))
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"cores": cores, "sec": round(best, 3),
                   "docs_per_sec": round(n_docs / best, 2)}}))
spark.stop()
"""

_POOL_CHILD = r"""
import json, sys, time, multiprocessing as mp
sys.path.insert(0, {repo!r})

def work(args):
    seed, n = args
    from tableextraction_spark.fixtures.html_gen import plan_html_doc, render_html_doc
    from tableextraction_spark.htmlx import extract_main_spans
    for i in range(seed * 10000, seed * 10000 + n):
        extract_main_spans(render_html_doc(plan_html_doc(i), i))
    return n

if __name__ == "__main__":
    cores = int(sys.argv[1]); reps = int(sys.argv[2]); per = 400
    best = None
    with mp.Pool(cores) as p:
        p.map(work, [(j, 8) for j in range(cores)])  # warm imports
        for _ in range(reps):
            t0 = time.time(); p.map(work, [(j, per) for j in range(cores)])
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
    print(json.dumps({{"cores": cores,
                       "docs_per_sec": round(cores * per / best, 2)}}))
"""

_PREGEN = r"""
import sys
sys.path.insert(0, {repo!r})
from tableextraction_spark.session import get_spark
from bench import ensure_html_corpus
spark = get_spark(app="hgen", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
ensure_html_corpus(spark, int(sys.argv[1]))
print('{{"generated": true}}')
spark.stop()
"""


def _run(code: str, args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    # ~1 ms/doc/core ⇒ 240k docs ≈ 60 s at local[4], ~16 s at local[16]:
    # long enough that JVM fixed costs are noise (same length rule the
    # raster scaling run established)
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 240000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    child = _CHILD.format(repo=REPO)
    pool = _POOL_CHILD.format(repo=REPO)
    _run(_PREGEN.format(repo=REPO), [str(n_docs)])
    r_lo = _run(child, [str(lo), str(n_docs), str(reps)])
    r_hi = _run(child, [str(hi), str(n_docs), str(reps)])
    p_lo = _run(pool, [str(lo), str(reps)])
    p_hi = _run(pool, [str(hi), str(reps)])

    ratio = hi / lo
    eff = (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / ratio
    hw = (p_hi["docs_per_sec"] / p_lo["docs_per_sec"]) / ratio
    print(json.dumps({
        "n_docs": n_docs,
        "levels": [lo, hi],
        f"local{lo}": r_lo,
        f"local{hi}": r_hi,
        "efficiency": round(eff, 3),
        "pool_baseline": {f"local{lo}": p_lo, f"local{hi}": p_hi,
                          "scaling": round(hw, 3)},
        "engine_normalized": round(eff / hw, 3) if hw > 0 else None,
        "gate": "PASS" if eff >= 0.8 or (hw > 0 and eff / hw >= 0.8) else "FAIL",
    }))


if __name__ == "__main__":
    main()
