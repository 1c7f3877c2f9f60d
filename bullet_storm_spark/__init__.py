"""bullet_storm_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of bullet-db/bullet-storm (Yahoo Bullet's Storm
backend), re-designed Spark-first.

Reference semantics (see SURVEY.md): a query is
``source -> filter -> projection -> aggregation -> (window) -> result``,
where aggregation is one of RAW / GROUP (ALL|BY) / COUNT DISTINCT /
DISTRIBUTION / TOP K (reference: /root/reference src/main/java/com/yahoo/
bullet/storm/FilterBolt.java:148-151, JoinBolt.java:147-163 and the
bullet-core Query object exercised throughout the reference test suite).

This package is NOT a port: queries compile to Spark DataFrame plans so that
Catalyst/Tungsten provide predicate pushdown, column pruning, partial+final
aggregation, whole-stage codegen and spill for free. Beyond the reference
surface it adds relational joins, deduplication (exact/MinHash-LSH/SimHash),
similarity search over embeddings, text analysis, and multimodal column
plumbing — the operators a large-scale training-data pipeline needs.
"""

from bullet_storm_spark.session import get_spark
from bullet_storm_spark.plans.expressions import (
    Expression,
    FieldExpression,
    ValueExpression,
    ListExpression,
    UnaryExpression,
    BinaryExpression,
    NAryExpression,
    CastExpression,
    SqlExpression,
    Operation,
)
from bullet_storm_spark.plans.query import (
    Query,
    Projection,
    Field,
    Raw,
    GroupBy,
    GroupAll,
    GroupOperation,
    GroupOpType,
    CountDistinct,
    Distribution,
    DistributionType,
    TopK,
    OrderBy,
    Having,
    Computation,
    Culling,
    TumblingWindow,
    SlidingRecordWindow,
)
from bullet_storm_spark.plans.compiler import compile_query, oracle_sql_for
from bullet_storm_spark.clip import Clip

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Expression",
    "FieldExpression",
    "ValueExpression",
    "ListExpression",
    "UnaryExpression",
    "BinaryExpression",
    "NAryExpression",
    "CastExpression",
    "SqlExpression",
    "Operation",
    "Query",
    "Projection",
    "Field",
    "Raw",
    "GroupBy",
    "GroupAll",
    "GroupOperation",
    "GroupOpType",
    "CountDistinct",
    "Distribution",
    "DistributionType",
    "TopK",
    "OrderBy",
    "Having",
    "Computation",
    "Culling",
    "TumblingWindow",
    "SlidingRecordWindow",
    "compile_query",
    "oracle_sql_for",
    "Clip",
]
