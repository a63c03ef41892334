"""ANN recall surface (round-5 VERDICT stretch #9): recall@k vs nprobe for
the compressed-domain searchers on the fixture embeddings — the first
property a user of an ANN index asks about.  Prints a markdown table (pasted
into BENCH_NOTES.md) and the raw numbers; tests/test_ann_recall.py pins the
measured floors so a regression in the codebook/ADC path fails loudly.

Usage: python tools/ann_recall.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from experiments_datafusion_spark.io import table  # noqa: E402
from experiments_datafusion_spark.operators import similarity as S  # noqa: E402

K = 5
NQ = 8
NPROBES = (1, 2, 3, 5, 10)


def recall_table(spark, sf_dir: str) -> dict[str, float]:
    """{series_name: recall@K} over the fixture corpus, NQ query vectors."""
    emb = table(spark, sf_dir, "embeddings").cache()
    q = emb.where(F.col("vec_id") < NQ)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in S.topk_bruteforce(emb, q, K).collect()
    }

    def rec(rows) -> float:
        return sum(1 for r in rows if (r["query_id"], r["neighbor_id"]) in truth) / len(
            truth
        )

    out: dict[str, float] = {}
    for nprobe in NPROBES:
        out[f"ivfpq@nprobe={nprobe}"] = rec(S.topk_ivfpq(emb, q, K, nprobe=nprobe).collect())
    out["pq (full scan, seed codebook)"] = rec(S.topk_pq(emb, q, K).collect())
    out["pq_trained (full scan, Lloyd)"] = rec(S.topk_pq_trained(emb, q, K).collect())
    emb.unpersist()
    return out


def main() -> None:
    from experiments_datafusion_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    out = recall_table(spark, sf_dir)
    print(f"\n| searcher | recall@{K} ({NQ} queries, {sf_dir}) |")
    print("|---|---|")
    for name, r in out.items():
        print(f"| {name} | {r:.3f} |")


if __name__ == "__main__":
    main()
