"""CQL2-text compiler: parse → Column equivalence against hand-built
predicates, on the events/documents tables."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from recipes_spark.io import load
from recipes_spark.plans.cql import CQLError, compile_cql


def _count(df, pred):
    return df.filter(pred).count()


@pytest.fixture(scope="module")
def ev(spark, sf_dir):
    return load(spark, sf_dir, "events").cache()


def test_comparisons(ev):
    assert _count(ev, compile_cql("value > 50")) == _count(
        ev, F.col("value") > 50
    )
    assert _count(ev, compile_cql("event_type = 'click'")) == _count(
        ev, F.col("event_type") == "click"
    )
    assert _count(ev, compile_cql("event_type <> 'click'")) == _count(
        ev, F.col("event_type") != "click"
    )


def test_boolean_structure_and_precedence(ev):
    got = compile_cql(
        "event_type = 'click' OR event_type = 'view' AND value >= 90"
    )
    want = (F.col("event_type") == "click") | (
        (F.col("event_type") == "view") & (F.col("value") >= 90)
    )
    assert _count(ev, got) == _count(ev, want)
    got2 = compile_cql(
        "(event_type = 'click' OR event_type = 'view') AND NOT value < 10"
    )
    want2 = ((F.col("event_type") == "click") | (F.col("event_type") == "view")) & ~(
        F.col("value") < 10
    )
    assert _count(ev, got2) == _count(ev, want2)


def test_between_in_like_null(ev):
    assert _count(ev, compile_cql("value BETWEEN 20 AND 30")) == _count(
        ev, F.col("value").between(20, 30)
    )
    assert _count(
        ev, compile_cql("event_type IN ('click', 'view', 'error')")
    ) == _count(ev, F.col("event_type").isin("click", "view", "error"))
    assert _count(ev, compile_cql("event_type LIKE 'c%'")) == _count(
        ev, F.col("event_type").like("c%")
    )
    assert _count(ev, compile_cql("event_type IS NOT NULL")) == ev.count()
    assert _count(ev, compile_cql("event_type NOT IN ('click')")) == _count(
        ev, ~F.col("event_type").isin("click")
    )


def test_timestamp_literal(ev):
    got = compile_cql("ts >= TIMESTAMP('2024-01-15 00:00:00')")
    want = F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp")
    assert _count(ev, got) == _count(ev, want)


def test_string_escaping(spark):
    df = spark.createDataFrame([("it's",), ("plain",)], "s string")
    # CQL doubles quotes inside strings: 'it''s' means it's.
    assert df.filter(compile_cql("s = 'it''s'")).count() == 1


def test_errors():
    for bad in ("value >", "AND value = 1", "value = 'unterminated",
                "value ! 3", "value = 1 extra"):
        with pytest.raises(CQLError):
            compile_cql(bad)


def test_cql_fuzz_controlled_errors():
    """Error-discipline fuzz: for ANY input text the compiler either
    returns a Column or raises CQLError — never an uncontrolled
    exception type (IndexError from token lookahead, RecursionError
    from deep nesting, etc.). A user-facing query compiler's crash
    class IS its API."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from recipes_spark.plans.cql import CQLError, compile_cql

    tokens = st.sampled_from(
        ["value", "=", "<", ">=", "AND", "OR", "NOT", "(", ")", "'x'",
         "1", "3.5", "BETWEEN", "IN", "LIKE", "IS", "NULL", ",",
         "T2024-01-01T00:00:00Z", "%", "'unterminated", "!", "  "]
    )
    @settings(max_examples=400, deadline=None)
    @given(st.lists(tokens, max_size=14).map(" ".join))
    def fuzz(text):
        try:
            compile_cql(text)
        except CQLError:
            pass

    fuzz()

    # Deep nesting must not blow the recursion limit uncontrolled.
    deep = "(" * 2000 + "value = 1" + ")" * 2000
    try:
        compile_cql(deep)
    except CQLError:
        pass
