"""Column-expression library shared by all operators.

Everything here returns :class:`pyspark.sql.Column` built from
``pyspark.sql.functions`` only — JVM-side, whole-stage-codegen'd, no Python
in the execution path.
"""

from featuregenerator_spark.functions.formatting import (
    fmt_feature,
    fmt_float_0f,
    with_prefix,
    drop_invalid,
    INT32_SENTINEL,
    INT64_SENTINEL,
)
from featuregenerator_spark.functions.normalizers import (
    Normalizer,
    normalize_expr,
    parse_normalizer,
)
from featuregenerator_spark.functions.bucketize import (
    bucketize_expr,
    time_diff_normal_expr,
)
from featuregenerator_spark.functions.combiners import (
    combine_array,
    COMBINERS,
)

__all__ = [
    "fmt_feature",
    "fmt_float_0f",
    "with_prefix",
    "drop_invalid",
    "INT32_SENTINEL",
    "INT64_SENTINEL",
    "Normalizer",
    "normalize_expr",
    "parse_normalizer",
    "bucketize_expr",
    "time_diff_normal_expr",
    "combine_array",
    "COMBINERS",
]
