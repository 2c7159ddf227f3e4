"""Declarative curation configs: vocab pins, validation, compiled runs."""

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark import spec as specmod
from featuregenerator_spark.spec import compile_config, compile_pipeline, parse_config


def test_metric_vocabs_pinned_to_operator_columns(spark):
    """The parse-time metric vocab must equal the actual operator dicts —
    if an operator gains/renames a metric, this pin fails first."""
    from featuregenerator_spark.operators.quality_rules import (
        quality_rule_columns,
    )
    from featuregenerator_spark.operators.text_clean import (
        c4_clean_columns,
        pii_scrub_columns,
    )

    assert tuple(quality_rule_columns(F.lit("x"))) == specmod._QUALITY_METRICS
    assert tuple(c4_clean_columns(F.lit("x"))) == specmod._C4_METRICS
    assert tuple(pii_scrub_columns(F.lit("x"))) == specmod._PII_METRICS


def test_parse_validates_metric_vocab():
    with pytest.raises(ValueError, match="metric must be one of"):
        parse_config(
            {"features": [{"feature_type": "quality_rule",
                           "feature_name": "x", "metric": "nope"}]}
        )
    with pytest.raises(ValueError, match="requires 'predicate'"):
        parse_config(
            {"features": [{"feature_type": "filter", "feature_name": "f"}]}
        )
    with pytest.raises(ValueError, match="requires 'id_column'"):
        parse_config(
            {"features": [{"feature_type": "lang_id_trigram",
                           "feature_name": "lang"}]}
        )


def test_compile_config_rejects_curation_entries(spark):
    df = spark.createDataFrame([(1, "t.")], "doc_id long, text string")
    with pytest.raises(ValueError, match="compile_pipeline"):
        compile_config(
            {"features": [{"feature_type": "pii_scrub",
                           "feature_name": "s", "metric": "n_email"}]},
            df,
        )


def test_compiled_curation_pipeline(spark):
    df = spark.createDataFrame(
        [
            (0, "keep me please today.\nme too thanks a lot.\nthird good line here."),
            (1, "no punct so dropped\nalso me\nx."),
        ],
        "doc_id long, text string",
    )
    config = {
        "features": [
            {"feature_type": "c4_clean", "feature_name": "kept",
             "metric": "n_kept_lines"},
            {"feature_type": "c4_clean", "feature_name": "keep_doc",
             "metric": "keep_doc"},
            {"feature_type": "text_metric", "feature_name": "n_tok",
             "metric": "token_count"},
            {"feature_type": "derive", "feature_name": "ok",
             "expression": "keep_doc AND n_tok > 5"},
            {"feature_type": "filter", "feature_name": "only_ok",
             "predicate": "ok"},
        ]
    }
    rows = compile_pipeline(config, df).collect()
    assert [r["doc_id"] for r in rows] == [0]
    assert rows[0]["kept"] == 3 and rows[0]["keep_doc"] is True


def test_compiled_pii_and_quality_metrics(spark):
    df = spark.createDataFrame(
        [(7, "ping a@b.io and the cat sat")], "doc_id long, text string"
    )
    config = {
        "features": [
            {"feature_type": "pii_scrub", "feature_name": "emails",
             "metric": "n_email"},
            {"feature_type": "pii_scrub", "feature_name": "clean",
             "metric": "scrubbed_text"},
            {"feature_type": "quality_rule", "feature_name": "stops",
             "metric": "stopword_hits"},
        ]
    }
    r = compile_pipeline(config, df).collect()[0]
    assert r["emails"] == 1
    assert r["clean"] == "ping <EMAIL> and the cat sat"
    assert r["stops"] == 2  # 'and', 'the'


def test_compiled_lang_id_trigram(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog near the river bank")],
        "doc_id long, text string",
    )
    config = {
        "features": [
            {"feature_type": "lang_id_trigram", "feature_name": "lang",
             "id_column": "doc_id"},
        ]
    }
    assert compile_pipeline(config, df).collect()[0]["lang"] == "en"


def test_parse_validates_substring_dedup():
    with pytest.raises(ValueError, match="requires 'k'"):
        parse_config(
            {"features": [{"feature_type": "substring_dup",
                           "feature_name": "s", "id_column": "doc_id"}]}
        )
    with pytest.raises(ValueError, match="k must be >= 2"):
        parse_config(
            {"features": [{"feature_type": "substring_trim",
                           "feature_name": "s", "k": 1,
                           "id_column": "doc_id"}]}
        )
    with pytest.raises(ValueError, match="min_occurrences must be >= 2"):
        parse_config(
            {"features": [{"feature_type": "substring_dup",
                           "feature_name": "s", "k": 4,
                           "id_column": "doc_id", "min_occurrences": 1}]}
        )


def test_compiled_substring_dedup_matches_operators(spark):
    """The declared lifts must equal direct operator calls column-for-
    column (declaration adds naming, never semantics)."""
    from featuregenerator_spark.operators.substring_dedup import (
        substring_dup_coverage,
        trim_dup_spans,
    )

    rows = [
        (1, "a b c d e f g h i j x y"),
        (2, "a b c d e f g h i j"),
        (3, "p q r s t u v w k l"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    config = {
        "features": [
            {"feature_type": "substring_dup", "feature_name": "sd",
             "k": 4, "id_column": "doc_id"},
            {"feature_type": "substring_trim", "feature_name": "clean",
             "k": 4, "id_column": "doc_id"},
        ]
    }
    got = {
        r["doc_id"]: r.asDict()
        for r in compile_pipeline(config, df).collect()
    }
    cov = {r["doc_id"]: r.asDict() for r in substring_dup_coverage(df, k=4).collect()}
    trm = {r["doc_id"]: r.asDict() for r in trim_dup_spans(df, k=4).collect()}
    for i in (1, 2, 3):
        assert got[i]["sd_windows"] == cov[i]["dup_windows"]
        assert got[i]["sd_frac"] == cov[i]["dup_token_frac"]
        assert got[i]["clean"] == trm[i]["text_clean"]
        assert got[i]["clean_removed"] == trm[i]["n_removed_tokens"]


def test_compiled_substring_filter_applies_in_order(spark):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i j"),
        (3, "p q r s t u v w k l"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    config = {
        "features": [
            {"feature_type": "substring_dup", "feature_name": "sd",
             "k": 4, "id_column": "doc_id"},
            {"feature_type": "filter", "feature_name": "uniq",
             "predicate": "sd_frac < 0.5"},
        ]
    }
    kept = sorted(r["doc_id"] for r in compile_pipeline(config, df).collect())
    assert kept == [3]


def test_parse_validates_quality_model():
    with pytest.raises(ValueError, match="requires 'weights'"):
        parse_config(
            {"features": [{"feature_type": "quality_model",
                           "feature_name": "q"}]}
        )
    with pytest.raises(ValueError, match="non-empty dict"):
        parse_config(
            {"features": [{"feature_type": "quality_model",
                           "feature_name": "q", "weights": {}}]}
        )
    with pytest.raises(ValueError, match="non-numeric weight"):
        parse_config(
            {"features": [{"feature_type": "quality_model",
                           "feature_name": "q", "weights": {"the": "hi"}}]}
        )
    with pytest.raises(ValueError, match="metric must be prob or score"):
        parse_config(
            {"features": [{"feature_type": "quality_model",
                           "feature_name": "q", "weights": {"the": 1.0},
                           "metric": "logit"}]}
        )


def test_compiled_quality_model_matches_operator(spark):
    from featuregenerator_spark.operators.quality_model import (
        DEMO_BIAS,
        DEMO_WEIGHTS,
        linear_score_columns,
    )

    df = spark.createDataFrame(
        [(1, "the fast data"), (2, "slow hash scan"), (3, "zz yy")],
        "doc_id long, text string",
    )
    config = {
        "features": [
            {"feature_type": "quality_model", "feature_name": "prob",
             "weights": DEMO_WEIGHTS, "bias": DEMO_BIAS},
            {"feature_type": "quality_model", "feature_name": "logit",
             "weights": DEMO_WEIGHTS, "bias": DEMO_BIAS, "metric": "score"},
            {"feature_type": "filter", "feature_name": "good",
             "predicate": "prob >= 0.5"},
        ]
    }
    got = {r["doc_id"]: r.asDict() for r in compile_pipeline(config, df).collect()}
    cols = linear_score_columns(F.col("text"), DEMO_WEIGHTS, DEMO_BIAS)
    exp = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            cols["quality_prob"].alias("p"),
            cols["quality_score"].alias("s"),
        ).collect()
        if r["p"] >= 0.5
    }
    assert set(got) == set(exp)
    for k in got:
        assert got[k]["prob"] == pytest.approx(exp[k]["p"], abs=1e-12)
        assert got[k]["logit"] == pytest.approx(exp[k]["s"], abs=1e-12)


def test_parse_validates_session6_types():
    from featuregenerator_spark.spec import parse_config

    with pytest.raises(ValueError, match="rates"):
        parse_config({"features": [
            {"feature_type": "source_mix", "feature_name": "c",
             "id_column": "doc_id", "source_column": "source"},
        ]})
    with pytest.raises(ValueError, match="id_column"):
        parse_config({"features": [
            {"feature_type": "lm_perplexity", "feature_name": "p"},
        ]})
    with pytest.raises(ValueError, match="id_column"):
        parse_config({"features": [
            {"feature_type": "paragraph_dedup", "feature_name": "t"},
        ]})


def test_compiled_mix_pipeline_matches_operators(spark):
    from featuregenerator_spark.operators.lm_perplexity import perplexity_filter
    from featuregenerator_spark.operators.paragraph_dedup import dedup_paragraphs
    from featuregenerator_spark.operators.sampling import source_mix_sample
    from featuregenerator_spark.spec import compile_pipeline

    df = spark.createDataFrame(
        [(i, f"a b c w{i % 3}\na b c w{i % 3}", "s" + str(i % 2))
         for i in range(40)],
        "doc_id long, text string, source string",
    )
    config = {"features": [
        {"feature_type": "lm_perplexity", "feature_name": "ppl",
         "id_column": "doc_id", "keep_logppl": 99.0,
         "train_predicate": "doc_id % 4 = 0"},
        {"feature_type": "paragraph_dedup", "feature_name": "clean",
         "id_column": "doc_id"},
        {"feature_type": "source_mix", "feature_name": "copy_idx",
         "id_column": "doc_id", "source_column": "source",
         "rates": {"s0": 2.0}, "default_rate": 1.0},
    ]}
    got = compile_pipeline(config, df)
    # row amplification: s0 docs appear twice, s1 once
    counts = {r["source"]: r["count"]
              for r in got.groupBy("source").count().collect()}
    assert counts == {"s0": 40, "s1": 20}
    # scoring equals the operator with the SAME declarative train split
    ops = perplexity_filter(
        df.select("doc_id", "text"),
        train_df=df.filter("doc_id % 4 = 0").select("doc_id", "text"),
        keep_logppl=99.0,
    )
    exp_ppl = {r["doc_id"]: r["lm_logppl"] for r in ops.collect()}
    exp_clean = {r["doc_id"]: r["clean_text"]
                 for r in dedup_paragraphs(df.select("doc_id", "text")).collect()}
    for r in got.dropDuplicates(["doc_id"]).collect():
        assert r["ppl"] == exp_ppl[r["doc_id"]]
        assert r["clean"] == exp_clean[r["doc_id"]]
        assert r["ppl_keep"] == 1
    # and the copy multiset equals the standalone sampler's
    mix = source_mix_sample(df, {"s0": 2.0}, default_rate=1.0)
    assert sorted(map(tuple, got.select("doc_id", "source", "copy_idx").collect())) \
        == sorted(map(tuple, mix.collect()))


def test_source_mix_rejects_following_per_id_lifts():
    from featuregenerator_spark.spec import parse_config

    bad = {"features": [
        {"feature_type": "source_mix", "feature_name": "c",
         "id_column": "doc_id", "source_column": "source", "rates": {"a": 1.0}},
        {"feature_type": "paragraph_dedup", "feature_name": "t",
         "id_column": "doc_id"},
    ]}
    with pytest.raises(ValueError, match="AFTER the row-amplifying 'source_mix'"):
        parse_config(bad)
    # the natural order parses fine
    ok = {"features": [bad["features"][1], bad["features"][0]]}
    assert len(parse_config(ok)) == 2


def test_compiled_text_normalize(spark):
    from featuregenerator_spark.spec import compile_pipeline

    df = spark.createDataFrame(
        [(1, "  Mixed   CASE x "), (2, "clean text")],
        "doc_id long, text string",
    )
    config = {"features": [
        {"feature_type": "text_normalize", "feature_name": "norm"},
        {"feature_type": "filter", "feature_name": "only_changed",
         "predicate": "norm_changed = 1"},
    ]}
    out = compile_pipeline(config, df).collect()
    assert [(r["doc_id"], r["norm"]) for r in out] == [(1, "mixed case x")]


def test_chunk_pack_spec_validation_and_amplifier_ordering():
    """chunk/pack parse-time validation + the row-amplifier contract:
    per-id corpus lifts declared after a chunk stage must be rejected
    (they would compute over one row per token window)."""
    import pytest

    from featuregenerator_spark.spec import parse_config

    with pytest.raises(ValueError, match="max_tokens"):
        parse_config({"features": [
            {"feature_type": "chunk", "feature_name": "c",
             "id_column": "doc_id", "max_tokens": 0}]})
    with pytest.raises(ValueError, match="overlap"):
        parse_config({"features": [
            {"feature_type": "chunk", "feature_name": "c",
             "id_column": "doc_id", "max_tokens": 10, "overlap": 10}]})
    with pytest.raises(ValueError, match="capacity"):
        parse_config({"features": [
            {"feature_type": "pack", "feature_name": "p", "capacity": 0,
             "tokens_column": "t", "order_by": ["doc_id"]}]})
    with pytest.raises(ValueError, match="order_by"):
        parse_config({"features": [
            {"feature_type": "pack", "feature_name": "p", "capacity": 10,
             "tokens_column": "t", "order_by": []}]})
    with pytest.raises(ValueError, match="amplif"):
        parse_config({"features": [
            {"feature_type": "chunk", "feature_name": "c",
             "id_column": "doc_id", "max_tokens": 10},
            {"feature_type": "paragraph_dedup", "feature_name": "pd",
             "id_column": "doc_id"}]})


def test_chunk_pack_spec_compiles_to_operators(spark):
    """JSON-declared chunk -> pack == the hand-built operator calls."""
    from featuregenerator_spark.operators.chunk_pack import (
        chunk_documents,
        pack_chunks,
    )
    from featuregenerator_spark.spec import compile_pipeline

    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 2), " ".join("w%d_%d" % (i, j) for j in range(25)))
         for i in range(8)],
        "doc_id long, source string, text string",
    )
    cfg = {"features": [
        {"feature_type": "chunk", "feature_name": "ck",
         "id_column": "doc_id", "max_tokens": 10, "overlap": 2},
        {"feature_type": "pack", "feature_name": "pk", "capacity": 32,
         "tokens_column": "ck_tokens", "order_by": ["doc_id", "ck_idx"],
         "by": ["source"]},
    ]}
    declared = compile_pipeline(cfg, docs).select(
        "doc_id", "source", "ck_idx", "ck_text", "ck_tokens",
        "pk_id", "pk_offset",
    )
    ch = chunk_documents(docs, max_tokens=10, overlap=2).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    built = pack_chunks(ch, capacity=32, by=["source"]).select(
        "doc_id", "source",
        F.col("chunk_idx").alias("ck_idx"),
        F.col("chunk_text").alias("ck_text"),
        F.col("chunk_tokens").alias("ck_tokens"),
        F.col("pack_id").alias("pk_id"),
        F.col("pack_offset").alias("pk_offset"),
    )
    assert declared.exceptAll(built).count() == 0
    assert built.exceptAll(declared).count() == 0


def test_amplifier_after_amplifier_is_rejected():
    """'chunk' joins chunk rows back on id_col and assumes unique ids, so
    a config where any row-amplifying stage precedes it (source_mix ->
    chunk, chunk -> chunk) would silently yield k^2 duplicated chunk rows
    per document — reject at parse time like the per-id corpus lifts."""
    import pytest

    from featuregenerator_spark.spec import parse_config

    mix = {"feature_type": "source_mix", "feature_name": "m",
           "id_column": "doc_id", "source_column": "source",
           "rates": {"a": 2.0}}
    chunk = {"feature_type": "chunk", "feature_name": "c",
             "id_column": "doc_id", "max_tokens": 10}
    chunk2 = dict(chunk, feature_name="c2")
    for bad in ([mix, chunk], [chunk, chunk2], [chunk, mix]):
        with pytest.raises(ValueError, match="AFTER the row-amplifying"):
            parse_config({"features": bad})
    # a single amplifier at the end still parses
    assert len(parse_config({"features": [chunk]})) == 1
