"""Python UDTF with analyze(): output schema derived from a constant
argument at plan time — the dynamic-schema half of the UDTF surface
(`doc_word_spans_udtf` covers the static-schema + lateralJoin half).

The demo is the classic fixed-width record splitter: the widths argument
DEFINES the output columns, so the schema cannot be declared statically
— exactly what analyze() exists for (mainframe/fixed-width ingestion,
parameterized pivots)."""

from __future__ import annotations

import pytest
from pyspark.sql.functions import udtf
from pyspark.sql.types import StringType, StructField, StructType
from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult


@udtf
class FixedWidth:
    """Split a line into fields by a comma-separated widths spec; one
    output column per width, named f1..fn at analyze time."""

    @staticmethod
    def analyze(line: AnalyzeArgument, widths: AnalyzeArgument) -> AnalyzeResult:
        if not widths.isConstantExpression:
            raise ValueError("widths must be a constant")
        n = len(str(widths.value).split(","))
        return AnalyzeResult(
            StructType([StructField(f"f{i + 1}", StringType()) for i in range(n)])
        )

    def eval(self, line, widths):
        if line is None:
            return
        out, off = [], 0
        for w in (int(x) for x in widths.split(",")):
            out.append(line[off : off + w])
            off += w
        yield tuple(out)


@pytest.fixture()
def registered(spark):
    spark.udtf.register("fixed_width", FixedWidth)
    return spark


def test_schema_follows_the_widths_argument(registered):
    spark = registered
    three = spark.sql("select * from fixed_width('abcdefgh', '3,2,3')")
    assert three.columns == ["f1", "f2", "f3"]
    assert three.collect()[0].asDict() == {"f1": "abc", "f2": "de", "f3": "fgh"}
    two = spark.sql("select * from fixed_width('abcdefgh', '4,4')")
    assert two.columns == ["f1", "f2"]
    assert two.collect()[0].asDict() == {"f1": "abcd", "f2": "efgh"}


def test_lateral_application_over_a_table(registered):
    spark = registered
    spark.createDataFrame(
        [("A123NYC",), ("B456SFO",)], "rec string"
    ).createOrReplaceTempView("recs")
    rows = spark.sql(
        "select g.f1 as tag, g.f2 as num, g.f3 as city "
        "from recs, lateral fixed_width(rec, '1,3,3') g order by tag"
    ).collect()
    assert [tuple(r) for r in rows] == [("A", "123", "NYC"), ("B", "456", "SFO")]
