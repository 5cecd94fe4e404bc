"""Solr XML update-format loader/writer (SURVEY §2.1 S4).

ref: solr/core/src/java/org/apache/solr/handler/loader/XMLLoader.java
     (parses ``<add><doc><field name="...">...</field>...``) and
     solr/core/src/java/org/apache/solr/response/XMLWriter.java.

Spark-first shape: XML payloads are just rows of a string column, so
both directions are ``mapInPandas`` stages — encode batches one
``<add>`` payload per Arrow batch (the many-docs-per-payload shape a
real /update POST has), decode parses any number of payload rows per
task with stdlib ``xml.etree`` (no external jars; this is why round 1
marked S4 SKIP — the spark-xml package is absent, the wire format
itself needs nothing but the stdlib).

All field values travel as text (the XML type model); the caller
restores the typed schema Catalyst-side via ``decoded(...)`` casts —
types live in the schema, not the payload, exactly like Solr where the
schema.xml fieldType governs parsing. Null fields are omitted
elements. Scale: both stages are narrow (no shuffle), payload size is
bounded by the Arrow batch size, and decode parallelism is one task
per payload partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

PAYLOAD_SCHEMA = StructType([StructField("xml", StringType())])


def encode_xml(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """Rows → one ``<add>`` payload string per Arrow batch."""
    fields = fields or df.columns
    src = df
    for c, t in src.dtypes:
        if c in fields and t != "string":
            src = src.withColumn(
                c,
                F.date_format(src[c], "yyyy-MM-dd HH:mm:ss.SSSSSS")
                if t.startswith("timestamp")
                else src[c].cast("string"),
            )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts = ["<add>"]
            for row in pdf[fields].itertuples(index=False):
                parts.append("<doc>")
                for name, val in zip(fields, row):
                    if val is None or pd.isna(val):
                        continue
                    # quoteattr: attribute position needs '"' escaped
                    # too (plain escape() leaves it, yielding malformed
                    # XML for a field name containing a quote)
                    parts.append(
                        f"<field name={quoteattr(name)}>"
                        f"{escape(str(val))}</field>"
                    )
                parts.append("</doc>")
            parts.append("</add>")
            yield pd.DataFrame({"xml": ["".join(parts)]})

    return src.mapInPandas(enc, PAYLOAD_SCHEMA)


def decode_xml(payloads: DataFrame, fields: list[str]) -> DataFrame:
    """``<add>`` payload strings → one all-string row per ``<doc>``
    (missing field elements become nulls)."""
    out_schema = StructType([StructField(f, StringType()) for f in fields])

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for payload in pdf["xml"]:
                root = ET.fromstring(payload)
                if root.tag != "add":
                    raise ValueError(f"expected <add> root, got <{root.tag}>")
                for doc in root.iterfind("doc"):
                    rows.append(
                        {
                            f.get("name"): (f.text or "")
                            for f in doc.iterfind("field")
                        }
                    )
            yield pd.DataFrame(
                {f: [r.get(f) for r in rows] for f in fields},
                dtype=object,
            )

    return payloads.mapInPandas(dec, out_schema)


def decoded(payloads: DataFrame, schema: StructType) -> DataFrame:
    """Decode and restore the typed schema (schema.xml fieldType
    analog): timestamps parse from the pinned encode format, other
    types are plain casts."""
    raw = decode_xml(payloads, [f.name for f in schema.fields])
    cols = []
    # raw[name] indexing, not F.col(name): field names are arbitrary
    # XML-side (may hold quotes/angle brackets the column-name parser
    # would choke on)
    for f in schema.fields:
        if isinstance(f.dataType, TimestampType):
            cols.append(
                F.to_timestamp(
                    raw[f.name], "yyyy-MM-dd HH:mm:ss.SSSSSS"
                ).alias(f.name)
            )
        else:
            cols.append(raw[f.name].cast(f.dataType).alias(f.name))
    return raw.select(*cols)
