"""Skew probe for the round-13 window rewrites (r13 verdict item 4).

freq_token_pairs / docs_tfidf_cosine compute document frequency as
count(*) OVER (PARTITION BY term) on distinct (doc_id, term) rows.  A
stop-word term present in EVERY doc lands its whole posting list in one
WindowExec group — this probe measures that worst case directly against
the two escape hatches (guide section 2.3/2.5):

  window   count(*) over (partition by term)            (shipped form)
  preagg   two-level: groupBy(term).count() -> sort-merge join back
  salted   two-level: groupBy(term, salt).count -> groupBy(term) -> join

The fixture is the post-tokenize shape itself (distinct (doc_id, term)
rows): N docs x 20 zipf-ish body terms from a 50k vocab, plus — in the
"skewed" variant — one synthetic term in 100% of docs (far beyond the
80%/50% df-caps, which only apply AFTER df is computed).  Group size for
any term is bounded by n_docs (rows are distinct per doc), which is the
written attribution the shipped form rests on; the probe quantifies what
that bound costs when it is actually reached.

  python tools/skew_probe.py [N_DOCS ...]   (default 300000 1000000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from experiments_datafusion_spark.session import get_spark  # noqa: E402

VOCAB = 50_000
TERMS_PER_DOC = 20
SALT_K = 32


def toks(spark, n_docs: int, skewed: bool):
    """Distinct (doc_id, term) posting rows, deterministic."""
    base = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.explode(F.sequence(F.lit(0), F.lit(TERMS_PER_DOC - 1))).alias("j"),
        )
        # xxhash-spread term ids: distinct per (doc, j) by construction
        .select(
            "doc_id",
            F.concat(
                F.lit("t"),
                (F.pmod(F.xxhash64(F.col("doc_id") * TERMS_PER_DOC + F.col("j")), F.lit(VOCAB))),
            ).alias("term"),
        )
        .distinct()
    )
    if not skewed:
        return base
    hot = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.lit("hotterm").alias("term")
    )
    return base.unionByName(hot)


def form_window(t):
    return t.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))


def form_preagg(t):
    d = t.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return t.join(d, "term")  # no broadcast hint: scale-honest sort-merge


def form_salted(t):
    s = t.withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(SALT_K)))
    part = s.groupBy("term", "salt").agg(F.count(F.lit(1)).alias("c"))
    d = part.groupBy("term").agg(F.sum("c").alias("df"))
    return t.join(d, "term")


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [300_000, 1_000_000]
    spark = get_spark("edfs-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    forms = {"window": form_window, "preagg": form_preagg, "salted": form_salted}
    for n in sizes:
        for skewed in (False, True):
            t = toks(spark, n, skewed).localCheckpoint(eager=True)
            # warmup each form once, then 3 interleaved timed rounds
            for fn in forms.values():
                fn(t).write.format("noop").mode("overwrite").save()
            times = {k: [] for k in forms}
            for _ in range(3):
                for k, fn in forms.items():
                    t0 = time.perf_counter()
                    fn(t).write.format("noop").mode("overwrite").save()
                    times[k].append(round(time.perf_counter() - t0, 3))
            print(
                json.dumps(
                    {
                        "n_docs": n,
                        "skewed": skewed,
                        "rows": t.count(),
                        **{k: {"times": v, "best": min(v)} for k, v in times.items()},
                    }
                ),
                flush=True,
            )
            t.unpersist()


if __name__ == "__main__":
    main()
