"""DateMathParser semantics (pinned to the public Solr contract).

ref: solr/core/src/java/org/apache/solr/util/DateMathParser.java
"""

from __future__ import annotations

import datetime

import pytest

from lucene_solr_spark.query.datemath import parse

NOW = datetime.datetime(2024, 1, 31, 12, 34, 56, 789123)


@pytest.mark.parametrize(
    "expr,want",
    [
        ("NOW", NOW),
        ("NOW/DAY", datetime.datetime(2024, 1, 31)),
        ("NOW/HOUR", datetime.datetime(2024, 1, 31, 12)),
        ("NOW/MINUTE", datetime.datetime(2024, 1, 31, 12, 34)),
        ("NOW/SECOND", datetime.datetime(2024, 1, 31, 12, 34, 56)),
        ("NOW/MILLI", datetime.datetime(2024, 1, 31, 12, 34, 56, 789000)),
        ("NOW/MONTH", datetime.datetime(2024, 1, 1)),
        ("NOW/YEAR", datetime.datetime(2024, 1, 1)),
        ("NOW+7DAYS", NOW + datetime.timedelta(days=7)),
        ("NOW-2HOURS", NOW - datetime.timedelta(hours=2)),
        ("NOW+30SECONDS", NOW + datetime.timedelta(seconds=30)),
        ("NOW+500MILLIS", NOW + datetime.timedelta(milliseconds=500)),
        # month-end clamp: Jan 31 + 1 month → Feb 29 (2024 is leap)
        ("NOW+1MONTH/DAY", datetime.datetime(2024, 2, 29)),
        ("NOW-1YEAR+1MONTH/DAY", datetime.datetime(2023, 2, 28)),
        # left-to-right chaining
        ("NOW/DAY+7DAYS-1HOUR", datetime.datetime(2024, 2, 6, 23)),
        ("NOW+1DAY/DAY", datetime.datetime(2024, 2, 1)),
        # DATE is an alias of DAY
        ("NOW/DATE", datetime.datetime(2024, 1, 31)),
        ("NOW+12MONTHS/YEAR", datetime.datetime(2025, 1, 1)),
    ],
)
def test_datemath(expr, want):
    assert parse(expr, NOW) == want


@pytest.mark.parametrize(
    "bad",
    ["TODAY", "NOW+DAYS", "NOW/5DAYS", "NOW+1FORTNIGHT", "NOW+1DAY junk", "NOW**"],
)
def test_datemath_rejects(bad):
    with pytest.raises(ValueError):
        parse(bad, NOW)
