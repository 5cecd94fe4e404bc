"""Javabin wire-format codec (SURVEY §2.1 S5), pure Python.

ref: solr/solrj/src/java/org/apache/solr/common/util/JavaBinCodec.java
     (format version 2). Solr's compact binary transport: a version
     byte, then tagged values — full-byte tags for primitives, and
     "size-in-tag" types whose upper 3 bits carry the type and lower 5
     bits a small size (0x1f escapes to a continued vint). Small ints/
     longs pack 4 value bits into the tag with an 0x10 continuation
     flag; strings are UTF-8 length-prefixed; repeated map keys go
     through the extern-string back-reference table.

Implemented subset (what /select responses and /update payloads use):
null, bool, byte/short/int/long (incl. packed small forms), float,
double, date, str, byte[], list, map (ORDERED_MAP / NAMED_LST / MAP),
SolrDocument, SolrDocumentList, extern strings. Iterator/stream tags
are out of scope (request-streaming only).

The sandbox has no JVM Solr to interop-test against, so the gate is
self-consistency: exhaustive + randomized encode→decode round-trips
(tests/test_javabin.py) plus byte-level golden vectors pinned from the
format rules above — the golden vectors keep the writer honest (a
matching read/write bug pair cannot hide).

Distributed use (:func:`encode_rows` / :func:`decode_rows`): one
javabin SolrDocumentList payload per Arrow batch over ``mapInPandas``
(binary column), mirroring the XML source; narrow both ways.
"""

from __future__ import annotations

import datetime as _dt
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, StructField, StructType

VERSION = 2

NULL, BOOL_TRUE, BOOL_FALSE, BYTE, SHORT, DOUBLE, INT, LONG, FLOAT, DATE = range(10)
MAP, SOLRDOC, SOLRDOCLST, BYTEARR, ITERATOR, END = range(10, 16)
STR = 1 << 5
SINT = 2 << 5
SLONG = 3 << 5
ARR = 4 << 5
ORDERED_MAP = 5 << 5
NAMED_LST = 6 << 5
EXTERN_STRING = 7 << 5


class SolrDocument(dict):
    """Marker subclass: encodes with the SOLRDOC tag."""


class SolrDocumentList(list):
    """Doc list + response header triplet (numFound, start, maxScore)."""

    def __init__(self, docs=(), num_found=None, start=0, max_score=None):
        super().__init__(docs)
        self.num_found = len(self) if num_found is None else num_found
        self.start = start
        self.max_score = max_score


class NamedList(list):
    """Ordered (name, value) pairs allowing repeats — NAMED_LST tag."""


class _Writer:
    def __init__(self) -> None:
        self.out = bytearray([VERSION])
        self._extern: dict[str, int] = {}

    def _vint(self, v: int) -> None:
        while v & ~0x7F:
            self.out.append((v & 0x7F) | 0x80)
            v >>= 7
        self.out.append(v)

    def _tag_size(self, tag: int, size: int) -> None:
        if size < 0x1F:
            self.out.append(tag | size)
        else:
            self.out.append(tag | 0x1F)
            self._vint(size - 0x1F)

    def _str_raw(self, s: str) -> None:
        b = s.encode("utf-8")
        self._tag_size(STR, len(b))
        self.out += b

    def _extern_str(self, s: str) -> None:
        idx = self._extern.get(s)
        if idx is not None:
            self._tag_size(EXTERN_STRING, idx)
        else:
            self._tag_size(EXTERN_STRING, 0)
            self._str_raw(s)
            self._extern[s] = len(self._extern) + 1

    def write(self, v) -> None:  # noqa: C901 — flat tag dispatch
        if v is None:
            self.out.append(NULL)
        elif isinstance(v, bool):
            self.out.append(BOOL_TRUE if v else BOOL_FALSE)
        elif isinstance(v, SolrDocumentList):
            self.out.append(SOLRDOCLST)
            self.write([v.num_found, v.start, v.max_score])
            self.write(list(v))
        elif isinstance(v, SolrDocument):
            self.out.append(SOLRDOC)
            self.write(dict(v))
        elif isinstance(v, int):
            if -(1 << 31) <= v and v >= 0:
                # packed small form: 4 value bits in the tag, 0x10 flag
                # says "more bits follow as vint" (sign never packs —
                # negatives use the fixed-width forms below)
                tag = SLONG if v >= (1 << 31) else SINT
                b = tag | (v & 0x0F)
                if v >= 0x0F:
                    self.out.append(b | 0x10)
                    self._vint(v >> 4)
                else:
                    self.out.append(b)
            elif -(1 << 31) <= v < (1 << 31):
                self.out.append(INT)
                self.out += struct.pack(">i", v)
            else:
                self.out.append(LONG)
                self.out += struct.pack(">q", v)
        elif isinstance(v, float):
            self.out.append(DOUBLE)
            self.out += struct.pack(">d", v)
        elif isinstance(v, _dt.datetime):
            self.out.append(DATE)
            millis = int(v.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000) \
                if v.tzinfo is None else int(v.timestamp() * 1000)
            self.out += struct.pack(">q", millis)
        elif isinstance(v, str):
            self._str_raw(v)
        elif isinstance(v, (bytes, bytearray)):
            self.out.append(BYTEARR)
            self._vint(len(v))
            self.out += bytes(v)
        elif isinstance(v, NamedList):
            self._tag_size(NAMED_LST, len(v))
            for name, val in v:
                self._extern_str(name)
                self.write(val)
        elif isinstance(v, dict):
            self._tag_size(ORDERED_MAP, len(v))
            for name, val in v.items():
                self._extern_str(name)
                self.write(val)
        elif isinstance(v, (list, tuple)):
            self._tag_size(ARR, len(v))
            for e in v:
                self.write(e)
        else:
            raise TypeError(f"javabin: unsupported type {type(v)!r}")


class _Reader:
    def __init__(self, buf: bytes) -> None:
        if not buf or buf[0] != VERSION:
            raise ValueError("javabin: bad version byte")
        self.buf = buf
        self.pos = 1
        self._extern: list[str] = []

    def _byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def _take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("javabin: truncated stream")
        self.pos += n
        return b

    def _vint(self) -> int:
        shift = v = 0
        while True:
            b = self._byte()
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    def _size(self, tag: int) -> int:
        sz = tag & 0x1F
        if sz == 0x1F:
            sz += self._vint()
        return sz

    def read(self):  # noqa: C901 — flat tag dispatch
        tag = self._byte()
        high = tag & 0xE0
        if high:
            if high == STR:
                return self._take(self._size(tag)).decode("utf-8")
            if high in (SINT, SLONG):
                v = tag & 0x0F
                if tag & 0x10:
                    v |= self._vint() << 4
                return v
            if high == ARR:
                return [self.read() for _ in range(self._size(tag))]
            if high in (ORDERED_MAP, NAMED_LST):
                n = self._size(tag)
                pairs = [(self.read(), self.read()) for _ in range(n)]
                if high == NAMED_LST:
                    return NamedList(pairs)
                return dict(pairs)
            if high == EXTERN_STRING:
                sz = self._size(tag)
                if sz == 0:
                    s = self.read()
                    self._extern.append(s)
                    return s
                return self._extern[sz - 1]
        if tag == NULL:
            return None
        if tag == BOOL_TRUE:
            return True
        if tag == BOOL_FALSE:
            return False
        if tag == BYTE:
            return struct.unpack(">b", self._take(1))[0]
        if tag == SHORT:
            return struct.unpack(">h", self._take(2))[0]
        if tag == DOUBLE:
            return struct.unpack(">d", self._take(8))[0]
        if tag == INT:
            return struct.unpack(">i", self._take(4))[0]
        if tag == LONG:
            return struct.unpack(">q", self._take(8))[0]
        if tag == FLOAT:
            return struct.unpack(">f", self._take(4))[0]
        if tag == DATE:
            millis = struct.unpack(">q", self._take(8))[0]
            return _dt.datetime.fromtimestamp(millis / 1000.0, _dt.timezone.utc).replace(
                tzinfo=None
            )
        if tag == BYTEARR:
            return bytes(self._take(self._vint()))
        if tag == SOLRDOC:
            return SolrDocument(self.read())
        if tag == SOLRDOCLST:
            meta = self.read()
            docs = self.read()
            return SolrDocumentList(
                docs, num_found=meta[0], start=meta[1], max_score=meta[2]
            )
        raise ValueError(f"javabin: unknown tag {tag:#x} at {self.pos - 1}")


def dumps(obj) -> bytes:
    w = _Writer()
    w.write(obj)
    return bytes(w.out)


def loads(buf: bytes):
    r = _Reader(buf)
    obj = r.read()
    if r.pos != len(buf):
        raise ValueError("javabin: trailing bytes")
    return obj


# ---------------------------------------------------------------------------
# Distributed encode/decode (S5 as a Spark source/sink)
# ---------------------------------------------------------------------------

PAYLOAD_SCHEMA = StructType([StructField("javabin", BinaryType())])


def encode_rows(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """Rows → one javabin SolrDocumentList payload per Arrow batch."""
    fields = fields or df.columns

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs = []
            import numpy as np

            for row in pdf[fields].itertuples(index=False):
                d = SolrDocument()
                for name, val in zip(fields, row):
                    if val is None or pd.isna(val):
                        continue
                    if isinstance(val, pd.Timestamp):
                        val = val.to_pydatetime()
                    elif isinstance(val, np.generic):
                        val = val.item()  # numpy scalar → Python scalar
                    d[name] = val
                docs.append(d)
            yield pd.DataFrame({"javabin": [dumps(SolrDocumentList(docs))]})

    return df.mapInPandas(enc, PAYLOAD_SCHEMA)


def decode_rows(payloads: DataFrame, schema: StructType) -> DataFrame:
    """Javabin payloads → typed rows (absent keys become nulls)."""
    names = [f.name for f in schema.fields]

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for payload in pdf["javabin"]:
                lst = loads(bytes(payload))
                if not isinstance(lst, SolrDocumentList):
                    raise ValueError("expected a SolrDocumentList payload")
                rows.extend(lst)
            yield pd.DataFrame(
                {n: [r.get(n) for r in rows] for n in names}, dtype=object
            )

    return payloads.mapInPandas(dec, schema)
