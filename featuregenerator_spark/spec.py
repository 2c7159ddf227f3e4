"""FeatureConfig JSON -> typed feature specs.

Mirrors the declarative surface of the reference
(``fg_lite/feature/FeatureConfig.cpp:24-107`` parse/dispatch,
``FeatureFunctionCreator.cpp:140-223`` factory): a run is a JSON document

    {"features": [
        {"feature_type": "id_feature", "feature_name": "role_id",
         "expression": "role", "need_prefix": true},
        {"feature_type": "lookup_feature", "feature_name": "tool_cnt_1h",
         "map_keys": "hist_tools", "map_values": "hist_vals",
         "value_timestamps": "hist_ts", "pvtime": "ts_sec", "key": "tool",
         "timediff": 3600, "combiner2": "count", "count_cut_threshold": 10},
        ...]}

Each entry becomes a typed spec; ``compile_spec`` resolves expressions
against a DataFrame's columns and returns named Columns, so a whole config
compiles into ONE ``df.select(...)`` that Catalyst optimizes end-to-end.
Config validation mirrors the reference's throws (sorted boundaries,
FeatureConfig.h:42-45; discrete/optimized conflicts, :241-243).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from featuregenerator_spark.functions.normalizers import Normalizer, parse_normalizer


@dataclass
class FeatureSpec:
    feature_type: str
    feature_name: str
    params: dict[str, Any] = field(default_factory=dict)

    def depend_inputs(self) -> list[str]:
        """Named input expressions — the host prunes columns with this
        (manual column pruning in the reference, FeatureConfig.h:111-127;
        Catalyst does it automatically, but we keep the API for parity)."""
        keys = (
            "expression",
            "expressions",
            "map",
            "map_keys",
            "map_values",
            "key",
            "pvtime",
            "value_timestamps",
            "user",
            "item",
            "category",
            "query",
            "title",
        )
        out: list[str] = []
        for k in keys:
            v = self.params.get(k)
            if isinstance(v, str):
                out.append(v)
            elif isinstance(v, list):
                out.extend(v)
        return out


_KNOWN_TYPES = {
    "id_feature",
    "raw_feature",
    "combo_feature",
    "lookup_feature",
    "lookup_feature_v2",
    "lookup_feature_v3",
    "lookup_feature_btree",
    "match_feature",
    "overlap_feature",
    "kgb_match_semantic",
    "preclick_urb_word_feature",
    # row-level declarative SQL expression (the reference's "expression"
    # strings, generalized: any deterministic Spark SQL scalar expression,
    # may reference features declared earlier in the list)
    "derive",
}

# DataFrame-level temporal lifts (plans/temporal.py, plans/skew.py): the
# "declared, not programmed" contract (SURVEY.md §3.1) extended to the
# pipeline lifts the north rule mandates — a JSON config can declare the
# whole flagship turn-feature program (pinned in tests/test_spec_full.py).
# These compile through compile_pipeline (ordered DataFrame transforms),
# not compile_config (a single select of row-level Columns).
_TEMPORAL_TYPES = {
    "ts_seconds",
    "gap_feature",
    "rolling_count",
    "rolling_agg",
    "decayed_sum",
    "gap_since_match",
    "sessionize",
    "lag_lead",
    "backfill",
    "asof_join",
}

# Document-curation lifts (operators/quality_rules.py, text_clean.py,
# functions/lang_trigram.py, operators/text_analysis.py): the same
# "declared, not programmed" contract extended to the training-data
# curation stage — a JSON config declares metrics, cleaning, scrubbing,
# language ID, derived flags, and row filters, applied in order.
_CURATION_TYPES = {
    "quality_rule",
    "c4_clean",
    "pii_scrub",
    "text_metric",
    "lang_id_trigram",
    "filter",
    # corpus-level dedup lifts (operators/substring_dedup.py): unlike the
    # per-row metrics these shuffle (window-hash groupBy + join back),
    # declared in the same config and applied in declaration order
    "substring_dup",
    "substring_trim",
    # model-based quality scoring (operators/quality_model.py): the JSON
    # carries the weight table itself — a checkpoint IS config
    "quality_model",
    # corpus-level lifts added in round 4 session 6: paragraph-granularity
    # dedup, the relational LM-perplexity filter, and the (row-amplifying)
    # deterministic source-mix resampler — the mixture table IS config,
    # like quality_model's weights
    "paragraph_dedup",
    "lm_perplexity",
    "source_mix",
    # canonicalization before hashing/dedup (operators/text_clean.py)
    "text_normalize",
    # training-batch tail (operators/chunk_pack.py): chunk is
    # row-amplifying like source_mix; pack windows per declared shard
    "chunk",
    "pack",
}

# lifts that emit k output rows per input row — per-id corpus lifts
# cannot follow any of them (validated in parse_config)
_ROW_AMPLIFYING_TYPES = {"source_mix", "chunk"}

# lifts that groupBy/join-back on the document id and therefore assume
# each id appears once — cannot follow the row-amplifying source_mix
# (validated in parse_config)
_PER_ID_CORPUS_TYPES = {
    "substring_dup",
    "substring_trim",
    "paragraph_dedup",
    "lm_perplexity",
}

# metric vocabularies validated at parse time; pinned against the actual
# operator column dicts in tests/test_spec_curation.py so they cannot
# drift from the implementations
_QUALITY_METRICS = (
    "n_words",
    "n_lines",
    "mean_word_len",
    "symbol_word_ratio",
    "alpha_word_frac",
    "stopword_hits",
    "dup_line_frac",
    "dup_line_char_frac",
    "bullet_line_frac",
    "ellipsis_line_frac",
    "passes_gopher",
)
_C4_METRICS = ("n_lines", "n_kept_lines", "n_dropped_lines", "clean_text", "keep_doc")
_PII_METRICS = ("n_email", "n_ip", "n_phone", "scrubbed_text")
_TEXT_METRICS = ("token_count", "quality_score", "fingerprint")

_CURATION_REQUIRED = {
    "quality_rule": ("metric",),
    "c4_clean": ("metric",),
    "pii_scrub": ("metric",),
    "text_metric": ("metric",),
    "lang_id_trigram": ("id_column",),
    "filter": ("predicate",),
    "substring_dup": ("k", "id_column"),
    "substring_trim": ("k", "id_column"),
    "quality_model": ("weights",),
    "paragraph_dedup": ("id_column",),
    "lm_perplexity": ("id_column",),
    "source_mix": ("id_column", "source_column", "rates"),
    "text_normalize": (),
    "chunk": ("id_column", "max_tokens"),
    "pack": ("capacity", "tokens_column", "order_by"),
}
_CURATION_METRIC_VOCAB = {
    "quality_rule": _QUALITY_METRICS,
    "c4_clean": _C4_METRICS,
    "pii_scrub": _PII_METRICS,
    "text_metric": _TEXT_METRICS,
}

# required params per temporal type (validated at parse time — the same
# config-time-over-runtime-error stance as the kernel validations below)
_TEMPORAL_REQUIRED = {
    "rolling_count": ("window_seconds",),
    "rolling_agg": ("window_seconds", "expression", "agg"),
    "decayed_sum": ("half_life_seconds",),
    "gap_since_match": ("filter", "timediff"),
    "sessionize": ("gap_seconds",),
    "lag_lead": ("columns",),
    "backfill": ("columns",),
    "asof_join": ("right_table", "on", "left_ts", "right_ts", "value_cols"),
}

_ROLLING_AGGS = ("sum", "min", "max", "avg", "mean")

# document-level "defaults" keys that merge under temporal entries
_TEMPORAL_DEFAULT_KEYS = ("partition_by", "order_by", "ts_seconds_column")


def _opt(params: dict, *names, default=None):
    """First present key wins — the reference JSON surface mixes camelCase
    and snake_case (FeatureConfig.h:206-228: "is_optimized" but
    "countCutThreshold"); accept both spellings everywhere."""
    for n in names:
        if n in params:
            return params[n]
    return default


def parse_config(config: str | dict) -> list[FeatureSpec]:
    """Parse a FeatureConfig JSON document into typed specs (validated)."""
    doc = json.loads(config) if isinstance(config, str) else config
    defaults = doc.get("defaults", {})
    specs: list[FeatureSpec] = []
    for entry in doc.get("features", []):
        ftype = entry.get("feature_type")
        if (
            ftype not in _KNOWN_TYPES
            and ftype not in _TEMPORAL_TYPES
            and ftype not in _CURATION_TYPES
        ):
            raise ValueError(f"unknown feature_type: {ftype!r}")
        name = entry.get("feature_name")
        if not name:
            raise ValueError("feature_name is required")
        params = {k: v for k, v in entry.items() if k not in ("feature_type", "feature_name")}
        if ftype in _CURATION_TYPES:
            for req in _CURATION_REQUIRED.get(ftype, ()):
                if req not in params:
                    raise ValueError(f"{name}: {ftype} requires {req!r}")
            vocab = _CURATION_METRIC_VOCAB.get(ftype)
            if vocab and params["metric"] not in vocab:
                raise ValueError(
                    f"{name}: {ftype} metric must be one of {vocab}, "
                    f"got {params['metric']!r}"
                )
            if ftype in ("substring_dup", "substring_trim"):
                if int(params["k"]) < 2:
                    raise ValueError(f"{name}: k must be >= 2")
                if int(params.get("min_occurrences", 2)) < 2:
                    raise ValueError(f"{name}: min_occurrences must be >= 2")
            if ftype == "chunk":
                mt, ov = int(params["max_tokens"]), int(params.get("overlap", 0))
                if mt <= 0:
                    raise ValueError(f"{name}: max_tokens must be positive")
                if not 0 <= ov < mt:
                    raise ValueError(
                        f"{name}: overlap must satisfy 0 <= overlap < max_tokens"
                    )
            if ftype == "pack":
                if int(params["capacity"]) <= 0:
                    raise ValueError(f"{name}: capacity must be positive")
                if not params["order_by"]:
                    raise ValueError(f"{name}: order_by must be non-empty")
            if ftype == "quality_model":
                w = params["weights"]
                if not isinstance(w, dict) or not w:
                    raise ValueError(f"{name}: weights must be a non-empty dict")
                bad = [t for t, v in w.items() if not isinstance(v, (int, float))]
                if bad:
                    raise ValueError(f"{name}: non-numeric weight for {bad[:3]}")
                if params.get("metric", "prob") not in ("prob", "score"):
                    raise ValueError(f"{name}: metric must be prob or score")
            specs.append(FeatureSpec(ftype, name, params))
            continue
        if ftype in _TEMPORAL_TYPES:
            for k in _TEMPORAL_DEFAULT_KEYS:
                if k not in params and k in defaults:
                    params[k] = defaults[k]
            for req in _TEMPORAL_REQUIRED.get(ftype, ()):
                if req not in params:
                    raise ValueError(f"{name}: {ftype} requires {req!r}")
            if ftype == "rolling_agg" and params["agg"] not in _ROLLING_AGGS:
                raise ValueError(
                    f"{name}: agg must be one of {_ROLLING_AGGS}, "
                    f"got {params['agg']!r}"
                )
            if ftype == "gap_since_match" and params.get(
                "gap", "gap_min"
            ) not in ("gap_min", "gap_max"):
                raise ValueError(f"{name}: gap must be gap_min or gap_max")
            for wkey in (
                "window_seconds",
                "timediff",
                "gap_seconds",
                "half_life_seconds",
            ):
                if wkey in params and ftype in _TEMPORAL_REQUIRED and wkey in _TEMPORAL_REQUIRED[ftype]:
                    if not float(params[wkey]) > 0:
                        raise ValueError(f"{name}: {wkey} must be positive")
            specs.append(FeatureSpec(ftype, name, params))
            continue
        if ftype == "derive":
            if not params.get("expression"):
                raise ValueError(f"{name}: derive requires 'expression'")
            specs.append(FeatureSpec(ftype, name, params))
            continue
        bounds = params.get("bucketize_boundaries")
        if bounds and list(bounds) != sorted(bounds):
            raise ValueError(f"{name}: bucketize_boundaries must be sorted")
        # V3's per-dimension "bucketize_multi_boundaries" ("a,b|c,d"): the
        # reference parses it and validates per-dim sortedness
        # (FeatureConfig.h:359-385) but NO kernel consumes it (grep over
        # fg_lite: multiBoundaries appears only in the config class) — a
        # vestigial option. Parity = accept, validate identically, ignore.
        multi = params.get("bucketize_multi_boundaries")
        if multi:
            for dim_bounds in str(multi).split("|"):
                vals = [float(v) for v in dim_bounds.split(",") if v != ""]
                if vals != sorted(vals):
                    raise ValueError(
                        f"{name}: bucketize_multi_boundaries must be "
                        f"sorted per dimension (got {dim_bounds!r})"
                    )
        optimized = _opt(params, "isOptimized", "is_optimized")
        if params.get("needDiscrete") and optimized:
            raise ValueError(f"{name}: discrete and optimized are exclusive")
        if params.get("needWeighting") and optimized:
            # DELIBERATELY STRICTER than the reference: it errors only
            # when needDiscrete is also set and silently IGNORES
            # weighting on the dense path (LookupFeatureFunction.cpp:
            # 215-240); a silently-dropped option is a config bug, so we
            # reject the combination outright.
            raise ValueError(f"{name}: weighting and optimized are exclusive")
        if (
            ftype == "lookup_feature"
            and optimized
            and "map" not in params
            and "key" not in params
        ):
            raise ValueError(
                f"{name}: isOptimized lookup_feature needs a 'map' (or "
                "legacy 'key') input slot carrying the values array"
            )
        if ftype == "lookup_feature" and params.get("needCombo"):
            # the reference nullptr-errors at runtime on missing combo
            # inputs (Impl.h:157-168, 215-220); we reject at config time
            if params.get("comboSimple"):
                if not params.get("otherExpression"):
                    raise ValueError(
                        f"{name}: comboSimple needs 'otherExpression'"
                    )
            elif not all(
                params.get(k)
                for k in ("map2_keys", "map2_values", "value2_timestamps")
            ):
                raise ValueError(
                    f"{name}: needCombo requires map2_keys/map2_values/"
                    "value2_timestamps (or set comboSimple with "
                    "otherExpression)"
                )
        specs.append(FeatureSpec(ftype, name, params))
    # cross-entry contract: row-amplifying lifts (source_mix emits k
    # copies per id; chunk emits one row per token window), so any later
    # per-id corpus lift would see duplicated documents — doubled
    # paragraph counts, NLL averaged over replicated bigrams, k x k
    # join-back fan-out — with no runtime error. Reject at parse time;
    # declare such lifts before the amplifier (the natural order:
    # score/dedup the corpus, THEN resample/chunk it).
    mix_at = next(
        (
            i
            for i, s in enumerate(specs)
            if s.feature_type in _ROW_AMPLIFYING_TYPES
        ),
        None,
    )
    if mix_at is not None:
        # amplifiers are id-sensitive too: 'chunk' joins chunk rows back
        # on id_col and assumes unique ids, so source_mix -> chunk (or
        # chunk -> chunk) would silently emit k^2 duplicated chunk rows
        # per document — the same silent-blowup class as the per-id
        # corpus lifts. One amplifier per pipeline, nothing id-sensitive
        # after it.
        per_id_after = [
            s.feature_name
            for s in specs[mix_at + 1 :]
            if s.feature_type in (_PER_ID_CORPUS_TYPES | _ROW_AMPLIFYING_TYPES)
        ]
        if per_id_after:
            raise ValueError(
                f"per-document corpus lifts {per_id_after} declared AFTER "
                f"the row-amplifying {specs[mix_at].feature_type!r} would "
                "compute over amplified (duplicated) rows; declare them "
                "before the resample/chunk stage (and use at most one "
                "resample/chunk stage per pipeline)"
            )
    return specs


def compile_spec(spec: FeatureSpec, df: DataFrame) -> Column:
    """Resolve one spec against df's schema -> a named output Column."""
    from featuregenerator_spark.operators import (
        combo_feature as combo_mod,
        id_feature as id_mod,
        lookup_array as la_mod,
        raw_feature as raw_mod,
    )

    p = spec.params
    schema = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))

    def col(name: str) -> Column:
        if name not in schema:
            raise ValueError(f"{spec.feature_name}: unknown input column {name!r}")
        return F.col(name)

    if spec.feature_type == "derive":
        # declarative SQL scalar expression; analysis (unknown columns,
        # type errors) is Catalyst's job at resolution time
        return F.expr(p["expression"]).alias(spec.feature_name)

    if spec.feature_type == "id_feature":
        expr = p["expression"]
        dtype = schema[expr]
        from pyspark.sql import types as T

        # the key prefix defaults to the feature name (reference layout);
        # "prefix" overrides it for outputs named differently than their
        # key namespace (e.g. feature_name=role_id, prefix=role)
        prefix = p.get("prefix", spec.feature_name)
        if isinstance(dtype, T.ArrayType):
            out = id_mod.id_feature_multi(
                col(expr),
                prefix,
                dtype.elementType,
                p.get("need_prefix", True),
                p.get("prune_to", 5000),
                p.get("invalid_values"),
            )
        else:
            out = id_mod.id_feature_scalar(
                col(expr),
                prefix,
                dtype,
                p.get("need_prefix", True),
                p.get("invalid_values"),
            )
        return out.alias(spec.feature_name)

    if spec.feature_type == "raw_feature":
        expr = p["expression"]
        norm = parse_normalizer(p.get("normalizer"))
        bounds = p.get("bucketize_boundaries")
        from pyspark.sql import types as T

        if isinstance(schema[expr], T.ArrayType):
            out = raw_mod.raw_feature_multi(
                col(expr), norm, bounds, p.get("value_dimension")
            )
        else:
            out = raw_mod.raw_feature_scalar(col(expr), norm, bounds)
        return out.alias(spec.feature_name)

    if spec.feature_type == "combo_feature":
        exprs = p["expressions"]
        from pyspark.sql import types as T

        any_array = any(isinstance(schema[e], T.ArrayType) for e in exprs)
        if not any_array:
            out = combo_mod.combo_feature_scalar(
                [col(e) for e in exprs], spec.feature_name, p.get("need_prefix", True)
            )
        else:
            cols = [
                col(e)
                if isinstance(schema[e], T.ArrayType)
                else F.array(col(e))
                for e in exprs
            ]
            out = combo_mod.combo_feature_multi(
                cols,
                spec.feature_name,
                p.get("need_prefix", True),
                p.get("prune_limits"),
                p.get("prune_right"),
                p.get("need_sort", False),
            )
        return out.alias(spec.feature_name)

    if spec.feature_type == "lookup_feature":
        timediff = p.get("timediff", -1)
        from pyspark.sql import types as T

        keys = None
        if "key" in p:  # absent for isOptimized configs in reference layout
            keys = col(p["key"])
            if not isinstance(schema[p["key"]], T.ArrayType):
                keys = F.array(keys)
        if _opt(p, "isOptimized", "is_optimized"):
            from featuregenerator_spark.operators import lookup_feature as lf

            # the optimized path takes the values array from the
            # map/expression input slot, key unused
            # (LookupFeatureFunction.cpp:216-224); the legacy "key" slot
            # is accepted as a fallback for configs written against the
            # pre-round-2 layout
            src = p["map"] if "map" in p else p["key"]
            vals = col(src)
            if not isinstance(schema[src], T.ArrayType):
                vals = F.array(vals)
            out = lf.lookup_v1_optimized(
                vals,
                p.get("combiner", "sum"),
                parse_normalizer(p.get("normalizer")),
                p.get("bucketize_boundaries"),
            )
            return out.alias(spec.feature_name)
        if "map" in p:  # V1 "k:v" string-array form
            from featuregenerator_spark.operators import lookup_feature as lf

            if p.get("needDiscrete", True):
                out = lf.lookup_v1_discrete(
                    col(p["map"]), keys, spec.feature_name,
                    p.get("need_prefix", True),
                    p.get("default_lookup_value") is not None,
                    str(p.get("default_lookup_value", "")),
                )
            elif p.get("needWeighting"):
                out = lf.lookup_v1_weighting(
                    col(p["map"]), keys, spec.feature_name,
                    p.get("need_prefix", True),
                )
            else:
                out = lf.lookup_v1_dense(
                    col(p["map"]), keys,
                    p.get("combiner", "sum"),
                    parse_normalizer(p.get("normalizer")),
                    p.get("bucketize_boundaries"),
                )
            return out.alias(spec.feature_name)
        if timediff is not None and timediff >= 0:
            combiner2 = p.get("combiner2", "none")
            common = dict(
                map_keys=col(p["map_keys"]),
                map_values=col(p["map_values"]),
                value_ts=col(p["value_timestamps"]),
                pvtime=col(p["pvtime"]),
                keys=keys,
                timediff=float(timediff),
            )
            cut1 = _opt(p, "countCutThreshold", "count_cut_threshold", default=-1)
            cut2 = _opt(p, "count2CutThreshold", "count2_cut_threshold", default=-1)
            if p.get("needCombo"):
                if p.get("comboSimple"):
                    other = col(p["otherExpression"])
                    if not isinstance(schema[p["otherExpression"]], T.ArrayType):
                        other = F.array(other)
                    out = la_mod.lookup_combo_simple(
                        map_keys=common["map_keys"],
                        map_values=common["map_values"],
                        value_ts=common["value_ts"],
                        pvtime=common["pvtime"],
                        keys=keys,
                        other=other,
                        timediff=float(timediff),
                        feature_name=spec.feature_name,
                        need_prefix=p.get("need_prefix", True),
                        combo_right=p.get("comboRight", True),
                        count1_cut=cut1,
                        count2_cut=cut2,
                    )
                    return out.alias(spec.feature_name)
                out = la_mod.lookup_combo_counts(
                    map_keys=common["map_keys"],
                    map_values=common["map_values"],
                    value_ts=common["value_ts"],
                    map2_keys=col(p["map2_keys"]),
                    map2_values=col(p["map2_values"]),
                    value2_ts=col(p["value2_timestamps"]),
                    pvtime=common["pvtime"],
                    keys=keys,
                    timediff=float(timediff),
                    feature_name=spec.feature_name,
                    need_prefix=p.get("need_prefix", True),
                    combo_right=p.get("comboRight", True),
                    count1_cut=cut1,
                    count2_cut=cut2,
                )
                return out.alias(spec.feature_name)
            if combiner2 == "count":
                out = la_mod.lookup_count(**common, count_cut_threshold=cut1)
            elif combiner2 in ("gap_min", "gap_max"):
                out = la_mod.lookup_gap(
                    **common,
                    gap=combiner2,
                    default_value=float(p.get("default_lookup_value", 0) or 0),
                )
            else:
                out = la_mod.lookup_none_discrete(
                    **common,
                    feature_name=spec.feature_name,
                    need_prefix=p.get("need_prefix", True),
                    default_value=str(p.get("default_lookup_value", "")),
                )
            return out.alias(spec.feature_name)
        out = la_mod.lookup_dense(
            col(p["map_keys"]),
            col(p["map_values"]),
            keys,
            p.get("combiner", "sum"),
            p.get("bucketize_boundaries"),
        )
        return out.alias(spec.feature_name)

    if spec.feature_type in ("lookup_feature_v2", "lookup_feature_v3", "lookup_feature_btree"):
        # byte encodings are physical-only (SURVEY.md §4.3): the Spark
        # carrier is a MapType column, built offline by encode_map.
        from featuregenerator_spark.operators import lookup_encoded as le

        keys = col(p["key"])
        from pyspark.sql import types as T

        if not isinstance(schema[p["key"]], T.ArrayType):
            keys = F.array(keys)
        encoded = col(p["map"])
        if p.get("value_dimension", 1) > 1 or spec.feature_type == "lookup_feature_v3":
            out = le.lookup_encoded_multidim(
                encoded, keys, p.get("value_dimension", 1), p.get("combiner", "sum")
            )
        else:
            out = le.lookup_encoded_scalar(encoded, keys, p.get("combiner", "sum"))
        return out.alias(spec.feature_name)

    if spec.feature_type == "match_feature":
        from featuregenerator_spark.operators import match_feature as mf

        user_map = mf.parse_user_info(col(p["user"]))
        cat = col(p["category"]) if p.get("category") in schema else F.lit(
            p.get("category", "ALL")
        )
        item = col(p["item"]) if p.get("item") in schema else F.lit(
            p.get("item", "ALL")
        )
        mtype = p.get("match_type", "hit")
        if mtype == "hit" and p.get("needWeighting"):
            out = mf.match_hit_weighting(user_map, cat, item, spec.feature_name)
        elif mtype == "hit":
            out = (
                mf.match_hit_dense(user_map, cat, item)
                if not p.get("needDiscrete", True)
                else mf.match_hit_sparse(user_map, cat, item, spec.feature_name)
            )
        elif mtype == "multihit":
            out = mf.match_multihit_sparse(
                user_map, cat, item, spec.feature_name,
                p.get("show_category", True), p.get("show_item", True),
            )
        elif mtype == "cross":
            out = mf.match_cross(user_map, cat, item, spec.feature_name)
        elif mtype == "cos":
            out = mf.match_cos(user_map, cat, item)
        else:
            raise ValueError(f"unknown match_type {mtype!r}")
        return out.alias(spec.feature_name)

    if spec.feature_type == "overlap_feature":
        from featuregenerator_spark.operators import overlap_feature as of
        from pyspark.sql import types as T

        def tokens(name: str) -> Column:
            c = col(name)
            if isinstance(schema[name], T.ArrayType):
                return c
            return F.split(c, p.get("separator", " "))

        q, t = tokens(p["query"]), tokens(p["title"])
        method = p.get("method", "common_word")
        if method.endswith("_divided"):
            out = of.overlap_feature_sparse(
                q, t, method, spec.feature_name, p.get("need_prefix", True)
            )
        else:
            out = of.overlap_dense_clipped(q, t, method, p.get("cut_threshold", -1))
        return out.alias(spec.feature_name)

    if spec.feature_type == "kgb_match_semantic":
        from featuregenerator_spark.operators import kgb_match as km

        q, t = col(p["query"]), col(p["title"])
        if p.get("need_hit_ret"):
            out = km.kgb_hit_ret(
                q, t, spec.feature_name, p.get("need_prefix", True),
                col(p["other"]) if p.get("other") else None,
                p.get("combo_right", True),
            )
        elif p.get("as_bytes"):
            out = km.kgb_match_bytes(
                q, t, spec.feature_name, p.get("match", True),
                p.get("need_prefix", True),
            )
        else:
            out = km.kgb_match_terms(
                q, t, spec.feature_name, p.get("match", True),
                p.get("need_prefix", True),
            )
        return out.alias(spec.feature_name)

    if spec.feature_type == "preclick_urb_word_feature":
        from featuregenerator_spark.operators import preclick_urb as pu

        expr = col(p["expression"])
        kw = dict(
            need_prefix=p.get("need_prefix", True),
            delim_item=p.get("delim_item", ","),
            delim_kv=p.get("delim_kv"),
            need_decode=p.get("need_decode", False),
            uint64_keys=p.get("uint64_expression", False),
        )
        if p.get("need_match"):
            out = pu.match_words(
                expr, col(p["match"]), spec.feature_name,
                raw_expression=p.get("raw_expression", False),
                output_count=p.get("output_count", False),
                **kw,
            )
        else:
            out = pu.top_words(expr, spec.feature_name, **kw)
        return out.alias(spec.feature_name)

    raise NotImplementedError(
        f"compile_spec: unhandled feature_type {spec.feature_type!r}"
    )


def compile_config(config: str | dict, df: DataFrame) -> DataFrame:
    """Whole config -> one select() over df (plus passthrough keys).

    Row-level kernels only; configs that declare temporal lifts compile
    through :func:`compile_pipeline`."""
    specs = parse_config(config)
    lifted = [
        s
        for s in specs
        if s.feature_type in _TEMPORAL_TYPES or s.feature_type in _CURATION_TYPES
    ]
    if lifted:
        raise ValueError(
            "config declares temporal/curation features "
            f"({[s.feature_name for s in lifted]}); use "
            "compile_pipeline, which applies DataFrame-level lifts in "
            "declaration order"
        )
    cols = [F.col(c) for c in df.columns]
    cols.extend(compile_spec(s, df) for s in specs)
    return df.select(*cols)


def _apply_temporal(
    spec: FeatureSpec, df: DataFrame, tables: dict[str, DataFrame] | None
) -> DataFrame:
    """One temporal spec -> the corresponding plans/temporal (or skew-
    routed) DataFrame transform. Filters/expressions are declarative SQL
    strings (F.expr), the same surface as the reference's expression
    slots."""
    from featuregenerator_spark.plans import temporal

    p = spec.params
    name = spec.feature_name
    conv = p.get("partition_by", temporal.CONV)
    ts_sec = p.get("ts_seconds_column", temporal.TS_SEC)
    order_by = tuple(p.get("order_by", (temporal.TURN, temporal.TS_SEC)))
    t = spec.feature_type

    if t == "ts_seconds":
        return temporal.with_ts_seconds(df, p.get("ts_column", temporal.TS), name)
    if t == "gap_feature":
        bucketize = p.get("bucketize", True)
        out = temporal.with_gap(
            df, conv=conv, ts_sec=ts_sec, order_by=order_by, bucketize=bucketize
        )
        if name != "gap_seconds":
            out = out.withColumnRenamed("gap_seconds", name)
        bname = p.get("bucket_name", "gap_bucket")
        if bucketize and bname != "gap_bucket":
            out = out.withColumnRenamed("gap_bucket", bname)
        if bucketize and p.get("bucket_default") is not None:
            out = out.withColumn(
                bname, F.coalesce(F.col(bname), F.lit(p["bucket_default"]))
            )
        if p.get("horizon_seconds") is not None:
            # horizon-limited gap: null when the previous row is further
            # back than the horizon (plans/pipeline.py's day-chunk contract)
            out = out.withColumn(
                name,
                F.when(
                    F.col(name) <= float(p["horizon_seconds"]), F.col(name)
                ),
            )
        return out
    if t == "rolling_count":
        pred = F.expr(p["filter"]) if p.get("filter") else None
        return temporal.with_rolling_count(
            df,
            float(p["window_seconds"]),
            name,
            conv=conv,
            ts_sec=ts_sec,
            predicate=pred,
            include_current=p.get("include_current", False),
            count_cut_threshold=_opt(
                p, "count_cut_threshold", "countCutThreshold", default=-1
            ),
        )
    if t == "rolling_agg":
        return temporal.with_rolling_agg(
            df,
            float(p["window_seconds"]),
            F.expr(p["expression"]),
            p["agg"],
            name,
            conv=conv,
            ts_sec=ts_sec,
            include_current=p.get("include_current", True),
        )
    if t == "decayed_sum":
        return temporal.with_decayed_sum(
            df,
            float(p["half_life_seconds"]),
            name,
            value=F.expr(p["expression"]) if p.get("expression") else None,
            conv=conv,
            ts_sec=ts_sec,
            include_current=p.get("include_current", False),
        )
    if t == "gap_since_match":
        return temporal.with_gap_since_match(
            df,
            F.expr(p["filter"]),
            float(p["timediff"]),
            name,
            gap=p.get("gap", "gap_min"),
            default_value=float(p.get("default_value", 0.0)),
            conv=conv,
            ts_sec=ts_sec,
        )
    if t == "sessionize":
        return temporal.sessionize(
            df,
            float(p["gap_seconds"]),
            conv=conv,
            ts_sec=ts_sec,
            order_by=order_by,
            out=name,
        )
    if t == "lag_lead":
        return temporal.with_lag_lead(
            df,
            p["columns"],
            conv=conv,
            order_by=order_by,
            offsets=tuple(p.get("offsets", (1,))),
        )
    if t == "backfill":
        return temporal.backfill(df, p["columns"], conv=conv, order_by=order_by)
    if t == "asof_join":
        from featuregenerator_spark.plans.skew import asof_join_auto

        rt = p["right_table"]
        if not tables or rt not in tables:
            raise ValueError(
                f"{name}: asof_join right_table {rt!r} not provided — pass "
                "compile_pipeline(..., tables={name: DataFrame})"
            )
        return asof_join_auto(
            df,
            tables[rt],
            on=p["on"],
            left_ts=p["left_ts"],
            right_ts=p["right_ts"],
            value_cols=list(p["value_cols"]),
            strict=p.get("strict", False),
            tolerance=p.get("tolerance"),
            hot_rows_threshold=_opt(
                p, "hot_rows_threshold", "hotRowsThreshold", default=1_000_000
            ),
        )
    raise NotImplementedError(f"_apply_temporal: unhandled {t!r}")


def _apply_curation(s: FeatureSpec, df: DataFrame) -> DataFrame:
    """One curation spec entry -> one DataFrame transform. Scalar metrics
    append a named column (adjacent projections collapse in Catalyst);
    lang_id_trigram applies its broadcast-join lift; filter applies a
    WHERE over everything declared so far."""
    t, p = s.feature_type, s.params
    col_name = p.get("column", "text")
    if t == "filter":
        return df.where(F.expr(p["predicate"]))
    if t == "lang_id_trigram":
        from featuregenerator_spark.functions.lang_trigram import (
            with_lang_id_trigram,
        )

        return with_lang_id_trigram(
            df, p["id_column"], text_col=col_name, out=s.feature_name
        )
    if t == "substring_dup":
        from featuregenerator_spark.operators.substring_dedup import (
            substring_dup_coverage,
        )

        id_col = p["id_column"]
        cov = substring_dup_coverage(
            df.select(id_col, col_name),
            k=int(p["k"]),
            text_col=col_name,
            id_col=id_col,
            min_occurrences=int(p.get("min_occurrences", 2)),
        ).select(
            F.col(id_col),
            F.col("dup_windows").alias(f"{s.feature_name}_windows"),
            F.col("dup_token_frac").alias(f"{s.feature_name}_frac"),
        )
        return df.join(cov, id_col, "left")
    if t == "substring_trim":
        from featuregenerator_spark.operators.substring_dedup import (
            trim_dup_spans,
        )

        id_col = p["id_column"]
        trimmed = trim_dup_spans(
            df.select(id_col, col_name),
            k=int(p["k"]),
            text_col=col_name,
            id_col=id_col,
            min_occurrences=int(p.get("min_occurrences", 2)),
        ).select(
            F.col(id_col),
            F.col("text_clean").alias(s.feature_name),
            F.col("n_removed_tokens").alias(f"{s.feature_name}_removed"),
        )
        return df.join(trimmed, id_col, "left")
    if t == "text_normalize":
        from featuregenerator_spark.operators.text_clean import (
            normalize_text_columns,
        )

        cols = normalize_text_columns(F.col(col_name))
        return df.withColumn(s.feature_name, cols["norm_text"]).withColumn(
            f"{s.feature_name}_changed", cols["changed"]
        )
    if t == "paragraph_dedup":
        from featuregenerator_spark.operators.paragraph_dedup import (
            dedup_paragraphs,
        )

        id_col = p["id_column"]
        cleaned = dedup_paragraphs(
            df.select(id_col, col_name),
            text_col=col_name,
            id_col=id_col,
            sep=p.get("separator", "\n"),
        ).select(
            F.col(id_col),
            F.col("clean_text").alias(s.feature_name),
            F.col("n_dup_paragraphs").alias(f"{s.feature_name}_removed"),
            F.col("dup_para_frac").alias(f"{s.feature_name}_dup_frac"),
        )
        return df.join(cleaned, id_col, "left")
    if t == "lm_perplexity":
        from featuregenerator_spark.operators.lm_perplexity import (
            DEFAULT_KEEP_LOGPPL,
            perplexity_filter,
        )

        id_col = p["id_column"]
        # the "clean reference corpus" is itself declarative: a SQL
        # predicate over the input rows (default: the even-id half)
        train = df.where(F.expr(p.get("train_predicate", f"{id_col} % 2 = 0")))
        scored = perplexity_filter(
            df.select(id_col, col_name),
            train_df=train.select(id_col, col_name),
            text_col=col_name,
            id_col=id_col,
            keep_logppl=float(p.get("keep_logppl", DEFAULT_KEEP_LOGPPL)),
        ).select(
            F.col(id_col),
            F.col("lm_logppl").alias(s.feature_name),
            F.col("ppl_bucket").alias(f"{s.feature_name}_bucket"),
            F.col("keep").alias(f"{s.feature_name}_keep"),
        )
        return df.join(scored, id_col, "left")
    if t == "source_mix":
        from featuregenerator_spark.operators.sampling import copies_column

        copies = copies_column(
            F.col(p["id_column"]),
            F.col(p["source_column"]),
            {str(k): float(v) for k, v in p["rates"].items()},
            float(p.get("default_rate", 1.0)),
        )
        idxs = F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
            F.expr("CAST(array() AS array<int>)")
        )
        # row-amplifying: every declared column survives, one output row
        # per kept copy, copy index under the feature name
        return df.withColumn(s.feature_name, F.explode(idxs))
    if t == "chunk":
        from featuregenerator_spark.operators.chunk_pack import chunk_documents

        id_col = p["id_column"]
        ch = chunk_documents(
            df.select(id_col, col_name),
            max_tokens=int(p["max_tokens"]),
            overlap=int(p.get("overlap", 0)),
            text_col=col_name,
            id_col=id_col,
        ).select(
            id_col,
            F.col("chunk_idx").alias(f"{s.feature_name}_idx"),
            F.col("chunk_text").alias(f"{s.feature_name}_text"),
            F.col("chunk_tokens").alias(f"{s.feature_name}_tokens"),
        )
        # row-amplifying join-back: one output row per chunk, every
        # previously declared column rides along
        return df.join(ch, id_col)
    if t == "pack":
        from featuregenerator_spark.operators.chunk_pack import pack_chunks

        return pack_chunks(
            df,
            capacity=int(p["capacity"]),
            by=list(p.get("by", [])) or None,
            tokens_col=p["tokens_column"],
            order_cols=list(p["order_by"]),
            out_prefix=s.feature_name,
        )
    if t == "quality_model":
        from featuregenerator_spark.operators.quality_model import (
            linear_score_columns,
        )

        cols = linear_score_columns(
            F.col(col_name),
            {str(k): float(v) for k, v in p["weights"].items()},
            float(p.get("bias", 0.0)),
        )
        key = "quality_prob" if p.get("metric", "prob") == "prob" else "quality_score"
        return df.withColumn(s.feature_name, cols[key])
    if t == "quality_rule":
        from featuregenerator_spark.operators.quality_rules import (
            quality_rule_columns,
        )

        expr = quality_rule_columns(F.col(col_name))[p["metric"]]
    elif t == "c4_clean":
        from featuregenerator_spark.operators.text_clean import c4_clean_columns

        expr = c4_clean_columns(F.col(col_name))[p["metric"]]
    elif t == "pii_scrub":
        from featuregenerator_spark.operators.text_clean import pii_scrub_columns

        expr = pii_scrub_columns(F.col(col_name))[p["metric"]]
    elif t == "text_metric":
        from featuregenerator_spark.operators import text_analysis as ta

        fn = {
            "token_count": ta.token_count,
            "quality_score": ta.quality_score,
            "fingerprint": ta.rolling_fingerprint,
        }[p["metric"]]
        expr = fn(F.col(col_name))
    else:
        raise NotImplementedError(f"_apply_curation: unhandled {t!r}")
    return df.withColumn(s.feature_name, expr)


def compile_pipeline(
    config: str | dict,
    df: DataFrame,
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Whole config (row-level kernels + temporal lifts) -> one DataFrame
    program, entries applied in declaration order.

    Row-level entries append named columns (so later entries — including
    derive expressions and temporal filters — can reference earlier
    features); temporal entries apply the plans/temporal lifts. Adjacent
    projections collapse in Catalyst, so a config with no temporal entry
    plans identically to :func:`compile_config`'s single select. ``tables``
    resolves asof_join right_table names to DataFrames."""
    specs = parse_config(config)
    for s in specs:
        if s.feature_type in _TEMPORAL_TYPES:
            df = _apply_temporal(s, df, tables)
        elif s.feature_type in _CURATION_TYPES:
            df = _apply_curation(s, df)
        else:
            df = df.withColumn(s.feature_name, compile_spec(s, df))
    return df
