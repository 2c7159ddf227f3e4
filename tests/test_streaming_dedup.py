"""Stream-static incremental dedup: multi-batch parity with the batch path."""

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.streaming.stream_features import (
    DOCS_DDL,
    incremental_dedup_stream,
    read_document_stream,
    run_stream_to_memory,
)


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    # 3 parquet files -> with maxFilesPerTrigger=1 the stream sees at
    # least 3 micro-batches; ids 0 mod 10 are "today's ingest"
    rows = []
    for i in range(60):
        base = f"alpha beta gamma delta epsilon zeta w{i % 7}"
        if i % 10 == 0:
            text = base  # near-dups an existing doc i+1 (same words + one)
        else:
            text = base + f" extra{i}"
        rows.append((i, text, "en" if i % 2 == 0 else "fr", "s", len(text)))
    df = spark.createDataFrame(rows, DOCS_DDL)
    path = str(tmp_path_factory.mktemp("docs_stream"))
    df.repartition(3).write.mode("overwrite").parquet(path)
    return path


def test_stream_matches_batch_decisions(spark, doc_dir):
    static = spark.read.parquet(doc_dir)
    corpus = static.filter(F.col("doc_id") % 10 != 0)
    new_b = static.filter(F.col("doc_id") % 10 == 0)

    stream = read_document_stream(spark, doc_dir, max_files_per_trigger=1)
    out = incremental_dedup_stream(
        stream.filter(F.col("doc_id") % 10 == 0), corpus, threshold=0.5
    )
    spark.catalog.dropTempView("t_stream_dedup")
    run_stream_to_memory(out, "t_stream_dedup", "complete")
    got = sorted(map(tuple, spark.table("t_stream_dedup").collect()))

    want = sorted(
        map(tuple, incremental_dedup_stream(new_b, corpus, threshold=0.5).collect())
    )
    assert got == want
    assert len(got) > 0
    # every decision pairs a batch doc with a non-batch doc
    assert all(d % 10 == 0 and m % 10 != 0 for d, m, _ in got)


def test_ties_break_to_smallest_corpus_id(spark):
    new = spark.createDataFrame([(10, "a b c", "en", "s", 5)], DOCS_DDL)
    corp = spark.createDataFrame(
        [(7, "a b c", "en", "s", 5), (3, "a b c", "en", "s", 5)], DOCS_DDL
    )
    got = incremental_dedup_stream(new, corp, threshold=0.8).collect()
    assert [(r["doc_id"], r["match_id"], r["jaccard"]) for r in got] == [
        (10, 3, 1.0)
    ]
