"""Solr DateMath expression parser (SURVEY §2.7 Date row).

ref: solr/core/src/java/org/apache/solr/util/DateMathParser.java —
the ``NOW/DAY+7DAYS-1HOUR`` mini-language used by date range queries,
range facet gaps, and TTL expressions. Semantics pinned to the public
contract: the expression starts at ``NOW`` (caller-supplied — in a
distributed query NOW must be bound ONCE on the driver so every task
filters with the same instant), then applies left-to-right any number
of ``+<n><UNIT>``, ``-<n><UNIT>`` and ``/<UNIT>`` (floor-rounding)
steps. Month arithmetic clamps the day-of-month (Jan 31 + 1MONTH →
Feb 28/29), like Java's Calendar.add.
"""

from __future__ import annotations

import calendar
import datetime as _dt
import re

_UNITS = {
    "YEAR": "years", "YEARS": "years",
    "MONTH": "months", "MONTHS": "months",
    "DAY": "days", "DAYS": "days", "DATE": "days",
    "HOUR": "hours", "HOURS": "hours",
    "MINUTE": "minutes", "MINUTES": "minutes",
    "SECOND": "seconds", "SECONDS": "seconds",
    "MILLI": "millis", "MILLIS": "millis",
    "MILLISECOND": "millis", "MILLISECONDS": "millis",
}

_TOKEN = re.compile(r"([+\-/])(\d*)([A-Z]+)")


def _add_months(d: _dt.datetime, n: int) -> _dt.datetime:
    month0 = d.month - 1 + n
    year = d.year + month0 // 12
    month = month0 % 12 + 1
    day = min(d.day, calendar.monthrange(year, month)[1])
    return d.replace(year=year, month=month, day=day)


def _floor(d: _dt.datetime, unit: str) -> _dt.datetime:
    if unit == "years":
        return d.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "months":
        return d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "days":
        return d.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "hours":
        return d.replace(minute=0, second=0, microsecond=0)
    if unit == "minutes":
        return d.replace(second=0, microsecond=0)
    if unit == "seconds":
        return d.replace(microsecond=0)
    if unit == "millis":
        return d.replace(microsecond=d.microsecond // 1000 * 1000)
    raise AssertionError(unit)


def parse(expr: str, now: _dt.datetime) -> _dt.datetime:
    """Evaluate a DateMath expression against the supplied NOW."""
    expr = expr.strip()
    if not expr.startswith("NOW"):
        raise ValueError(f"DateMath must start with NOW: {expr!r}")
    rest = expr[3:]
    d = now
    pos = 0
    while pos < len(rest):
        m = _TOKEN.match(rest, pos)
        if not m:
            raise ValueError(f"bad DateMath at {rest[pos:]!r} in {expr!r}")
        op, num, unit_s = m.groups()
        unit = _UNITS.get(unit_s)
        if unit is None:
            raise ValueError(f"unknown DateMath unit {unit_s!r} in {expr!r}")
        if op == "/":
            if num:
                raise ValueError(f"rounding takes no count: {expr!r}")
            d = _floor(d, unit)
        else:
            if not num:
                raise ValueError(f"missing count after {op!r} in {expr!r}")
            n = int(num) * (1 if op == "+" else -1)
            if unit == "years":
                d = _add_months(d, 12 * n)
            elif unit == "months":
                d = _add_months(d, n)
            elif unit == "millis":
                d = d + _dt.timedelta(milliseconds=n)
            else:
                d = d + _dt.timedelta(**{unit: n})
        pos = m.end()
    return d
