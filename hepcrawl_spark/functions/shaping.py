"""C18 — list -> value-dict shaping (reference/hepcrawl/outputs.py:14-59).

The reference's output processors wrap scalar lists into the schema's
keyed-struct shapes (``[v] -> [{'value': v}]``, free keywords, PACS
classification numbers). Here each is one ``transform`` higher-order
function — pure JVM column expressions, no UDF, applied to array columns of
any size without exploding."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def list_to_value_dicts(col: Column | str, key: str = "value") -> Column:
    """ListToValueDict: ['a','b'] -> [{key:'a'}, {key:'b'}]."""
    return F.transform(_c(col), lambda x: F.struct(x.alias(key)))


def free_keywords(col: Column | str, source: str = "author") -> Column:
    """FreeKeywords: ['k'] -> [{'source': source, 'value': 'k'}]."""
    return F.transform(
        _c(col),
        lambda x: F.struct(F.lit(source).alias("source"), x.alias("value")),
    )


def classification_numbers(col: Column | str, standard: str = "PACS") -> Column:
    """ClassificationNumbers: ['12.38'] ->
    [{'standard': standard, 'classification_number': '12.38'}]."""
    return F.transform(
        _c(col),
        lambda x: F.struct(
            F.lit(standard).alias("standard"),
            x.alias("classification_number"),
        ),
    )
