"""A search/retrieval session on emdrive-spark: lexical BM25, exact and
approximate vector search, diversified re-ranking, and the recall meter
— the retrieval stack a RAG pipeline runs, each stage a registered,
checked engine operator.

Run: python examples/search_session.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from emdrive_spark import registry
from emdrive_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("emdrive-search-session")
    registry.load_all()
    q = registry.REGISTRY

    # 1. Lexical retrieval: exact BM25 over the corpus
    bm25 = q["text_search_bm25"].fn(spark, sf_dir)
    print("== top BM25 hits ==")
    bm25.orderBy(F.desc("score"), "doc_id").limit(5).show()

    # 2. Dense retrieval: exact brute-force kNN (the ground truth)
    knn = q["knn_topk"].fn(spark, sf_dir)
    print("== exact kNN top-10 ==")
    knn.show()

    # 3. The approximate path: IVF probe + its measured recall
    ivf = q["ann_ivf"].fn(spark, sf_dir)
    print(f"IVF probe returned {ivf.count()} candidates")
    recall = q["ann_recall"].fn(spark, sf_dir)
    mean_recall = recall.agg(F.avg("recall_at_10")).collect()[0][0]
    print(f"measured IVF recall@10 vs exact: {mean_recall:.2f}")

    # 4. Diversified re-ranking: MMR over the relevance pool
    mmr = q["embedding_mmr_rerank"].fn(spark, sf_dir)
    print("== MMR-diversified top-10 ==")
    mmr.show()

    # 5. The dialect path: the reference README's @-distance query
    at = q["sql_select_at_distance"].fn(spark, sf_dir)
    print("== `hash @ q` through the SQL dialect ==")
    at.show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
