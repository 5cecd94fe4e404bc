"""Distributed IndexSearcher over committed segments (SURVEY §3.2).

Physical plan:

    postings scan, filter term ∈ query terms        (Parquet row-group
                                                     pruning: files are
                                                     term-sorted — the
                                                     terms-dict seek)
      → tiny groupBy(term).sum(df) → driver          (Weight binding:
                                                     global df → idf,
                                                     cached per term)
      → groupBy(seg_id) → applyInPandas scorer       (vectorized decode,
                                                     leapfrog AND,
                                                     block-max WAND)
      → per-segment top-k rows
      → orderBy(score desc, conv, turn).limit(k)     (TakeOrderedAndProject
                                                     ≡ TopDocs.merge)

Only the pruned postings rows ever shuffle. The scorer task reads its
OWN segment's docmap columns (doc_len = norms; conv/turn ids; filter
fields = fq docvalues) straight from the segment's Parquet on shared
storage — exactly Lucene's per-segment norms/docvalues access pattern
(``SegmentReader``), and the property that keeps query cost independent
of corpus width: a query over 10^12 turns touches q-term postings plus
the docmaps of segments that contain them, never a corpus-wide shuffle.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lucene_solr_spark.index.manifest import Manifest
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.query.scorer import score_segment

RESULT_SCHEMA = "conv_id string, turn_idx int, score double"

#: docmap columns every scorer needs (norms + result ids)
_BASE_COLS = ["doc_ord", "doc_len", "conv_id", "turn_idx"]


def _exclude_filter_fields(
    spec: BooleanSpec, exclude_fields: tuple[str, ...]
) -> BooleanSpec | None:
    """Multi-select faceting domain (``{!ex=tag}``): drop every
    fq-side constraint whose field is excluded. Returns None
    (MatchAllDocs) when nothing constrains the domain afterwards —
    the fq-only multi-select case, where unchecking the one filter
    widens the facet back to the whole collection."""
    from dataclasses import replace

    out = replace(
        spec,
        filters=tuple(f for f in spec.filters if f[0] not in exclude_fields),
        not_filters=tuple(
            f for f in spec.not_filters if f[0] not in exclude_fields
        ),
        range_filters=tuple(
            f for f in spec.range_filters if f[0] not in exclude_fields
        ),
        in_filters=tuple(
            f for f in spec.in_filters if f[0] not in exclude_fields
        ),
        exists_filters=tuple(
            f for f in spec.exists_filters if f not in exclude_fields
        ),
        missing_filters=tuple(
            f for f in spec.missing_filters if f not in exclude_fields
        ),
    )
    constrains = (
        out.must or out.should or out.phrases or out.must_not
        or out.must_not_phrases or out.filters or out.not_filters
        or out.range_filters or out.in_filters or out.exists_filters
        or out.missing_filters or out.multi_phrases or out.span_near
        or out.span_or or out.span_not or out.span_first
        or out.span_range or out.span_within or out.wildcards
        or out.regexps
    )
    return out if constrains else None


def filter_cols(spec: BooleanSpec, base: list[str]) -> list[str]:
    """docmap columns needed beyond `base` for fq / negated / range fq."""
    want = {f for f, _ in spec.filters} | {f for f, _ in spec.not_filters}
    want |= {f for f, _, _ in spec.range_filters}
    want |= {f for f, _ in spec.in_filters}
    want |= set(spec.exists_filters) | set(spec.missing_filters)
    return list(base) + sorted(want - set(base))


def apply_deletes(allowed, dm, deleted):
    """AND the liveDocs mask (NOT tombstoned) into ``allowed``.

    ``deleted`` is a SORTED numpy bytes array of ``conv_id|turn_idx``
    keys (built once at searcher init): the membership test is one
    vectorized encode + ``searchsorted`` probe — numpy end to end, no
    per-row Python, near-free (de)serialization when the mask ships to
    tasks. No-op (returns ``allowed`` unchanged) when empty/None."""
    if deleted is None or not len(deleted):
        return allowed
    import numpy as np

    keys = np.char.add(
        np.char.add(dm["conv_id"].to_numpy(dtype="U"), "|"),
        dm["turn_idx"].to_numpy(dtype="U"),
    ).astype("S")
    # widen both sides to a common byte width (S-compare null-pads, so
    # widening preserves order and equality; plain astype would
    # TRUNCATE longer probe keys into false matches)
    w = max(deleted.dtype.itemsize, keys.dtype.itemsize)
    if keys.dtype.itemsize != w:
        keys = keys.astype(f"S{w}")
    if deleted.dtype.itemsize != w:
        deleted = deleted.astype(f"S{w}")
    idx = np.searchsorted(deleted, keys)
    idx[idx == len(deleted)] = 0
    live = deleted[idx] != keys
    return live if allowed is None else (allowed & live)


def filter_mask(dm, spec: BooleanSpec):
    """FILTER/NOT-FILTER doc mask over a docmap pandas frame, or None.

    Negated filters use differs-or-missing semantics (pandas ``==``
    is False on NaN, so ``~`` correctly admits missing values)."""
    if (not spec.filters and not spec.not_filters
            and not spec.range_filters and not spec.in_filters
            and not spec.exists_filters and not spec.missing_filters):
        return None
    mask = None
    for fld in spec.exists_filters:
        # FieldValueQuery (field:*): the field has a value
        m = dm[fld].notna().to_numpy(bool)
        mask = m if mask is None else (mask & m)
    for fld in spec.missing_filters:
        # -field:* : the field is missing
        m = dm[fld].isna().to_numpy(bool)
        mask = m if mask is None else (mask & m)
    for fld, val in spec.filters:
        m = (dm[fld] == val).to_numpy(bool)
        mask = m if mask is None else (mask & m)
    for fld, vals in spec.in_filters:
        # TermsQParser: set membership (missing field never matches —
        # pandas isin is False on NaN, TermInSetQuery semantics)
        m = dm[fld].isin(vals).to_numpy(bool)
        mask = m if mask is None else (mask & m)
    for fld, val in spec.not_filters:
        m = ~(dm[fld] == val).to_numpy(bool)
        mask = m if mask is None else (mask & m)
    for fld, lo, hi in spec.range_filters:
        col = dm[fld]
        for bound, is_lo in ((lo, True), (hi, False)):
            if bound is None:
                continue
            m = _range_cmp(col, bound, is_lo)
            mask = m if mask is None else (mask & m)
    return mask


def postings_task_columns(spec) -> list[str] | None:
    """Columns an in-task postings read needs (None = all). For a
    non-positional spec the pos pair stays in the parquet file — at
    corpus scale the position payload dominates postings bytes, the
    Lucene .pos-file IO contract (see BooleanSpec.needs_positions)."""
    if spec is None or spec.needs_positions:
        return None
    return ["seg_id", "term", "df", "cf", "first_docs", "doc_offs",
            "tf_offs", "max_tfs", "min_dls", "doc_bytes", "tf_bytes"]


def _write_bits(cache_dir: str, seg_id: int, payload: bytes) -> None:
    """Task-side atomic sidecar write: unique temp + rename, so a
    concurrent warm of the same entry (or a task retry) can never
    expose a torn file."""
    import uuid

    tmp = os.path.join(cache_dir, f".{seg_id}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, os.path.join(cache_dir, f"{seg_id}.bits"))


class SegBitsCache:
    """Executor-resident cached bitsets — the storage layer behind the
    filterCache and queryResultCache. The per-segment packed bits live
    as sidecar FILES under ``{index_root}/querycache/…/{seg_id}.bits``,
    written by the same seg-driver tasks that computed them and read
    back by whichever task serves that segment (the "tasks read their
    own segment's Parquet" locality pattern: on a cluster the cache
    shares the index's storage and data-locality, Solr's per-core
    filterCache analog — SolrIndexSearcher's caches are shard-local,
    never coordinator-resident). The DRIVER keeps only
    ``{seg_id: (n_docs, popcount)}`` — O(#segments) ints — so no
    single process ever materializes a corpus-width mask: at 10^12
    docs the old collect-and-broadcast design moved ~125 GB per cached
    entry through the driver and every executor (VERDICT r4 item 3);
    this handle moves ~16 bytes per segment. GC/replication never
    touch the dir (both sweep only ``segments/`` + ``deletes/``)."""

    __slots__ = ("path", "meta")

    def __init__(self, path: str, meta: dict[int, tuple[int, int]]):
        self.path = path
        self.meta = meta

    def get(self, seg_id: int) -> tuple[bytes, int]:
        """TASK-side: this one segment's packed bits + its doc count
        (a maxDoc/8-byte local read — never another segment's)."""
        with open(os.path.join(self.path, f"{seg_id}.bits"), "rb") as f:
            return f.read(), self.meta[seg_id][0]

    def popcount(self) -> int:
        """DRIVER-side |DocSet| from the warm-time per-segment
        popcounts — zero jobs, zero IO (the numFound fast path)."""
        return sum(p for _, p in self.meta.values())

    def destroy(self) -> None:
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)


def _range_cmp(col, bound: str, is_lo: bool):
    """Vectorized inclusive bound compare in the column's native type
    (missing values never match, TermRangeQuery semantics)."""
    import pandas as pd

    if pd.api.types.is_datetime64_any_dtype(col):
        v = pd.Timestamp(bound)
    elif pd.api.types.is_integer_dtype(col):
        v = int(bound)
    elif pd.api.types.is_float_dtype(col):
        v = float(bound)
    else:  # object strings (may hold None): NA-safe string compare
        cs = col.astype("string")
        m = (cs >= bound) if is_lo else (cs <= bound)
        return m.fillna(False).to_numpy(bool)
    m = (col >= v) if is_lo else (col <= v)
    return m.fillna(False).to_numpy(bool) if m.isna().any() else m.to_numpy(bool)


class IndexSearcher:
    """Searcher bound to the latest committed snapshot of an index."""

    def __init__(
        self,
        spark: SparkSession,
        index_root: str,
        analyzer_version: str | None = None,
        snapshot_id: int | None = None,
    ):
        """`analyzer_version`: the QUERY-TIME analysis chain version.
        When given, it must equal the chain the index was built with
        (manifest-recorded) — querying a stemmed index with unstemmed
        terms (or vice versa) silently misses matches, so the mismatch
        raises instead (the Analyzer invariant, ``Analyzer.java``:
        one chain at index and query time).

        `snapshot_id`: open a HISTORICAL commit point instead of the
        latest (``DirectoryReader.open(IndexCommit)`` / Iceberg
        time-travel): immutable segment files make every retained
        snapshot a complete consistent view, including its own
        tombstone set and global stats."""
        self.spark = spark
        self.index_root = index_root
        self.manifest = Manifest.load(index_root, snapshot_id=snapshot_id)
        if not self.manifest.segments:
            raise ValueError(f"no committed snapshot under {index_root}")
        from lucene_solr_spark.index.manifest import CURRENT_FORMAT

        if self.manifest.format_version > CURRENT_FORMAT:
            # forward-compat guard (Codec name check analog): v1/v2
            # both read fine (buckets are clustering only), a FUTURE
            # format may not
            raise ValueError(
                f"index format v{self.manifest.format_version} is newer "
                f"than this reader (v{CURRENT_FORMAT})"
            )
        if (
            analyzer_version is not None
            and analyzer_version != self.manifest.analyzer_version
        ):
            raise ValueError(
                f"query-time analyzer {analyzer_version!r} != index "
                f"analyzer {self.manifest.analyzer_version!r}"
            )
        dirs = self.manifest.seg_dirs()
        self._postings_files = [f"{d}/postings.parquet" for d in dirs]
        self._docmap_files = [f"{d}/docmap.parquet" for d in dirs]
        self._dict_files = [f"{d}/dicts.parquet" for d in dirs]
        #: seg_id → segment dir (shipped to scorer tasks; tiny)
        self.seg_dir_by_id = {
            int(seg["part"]): os.path.join(index_root, "segments", name)
            for name, seg in self.manifest.segments.items()
        }
        # Resolve file listings once (InMemoryFileIndex construction is
        # driver-side overhead we must not pay per query).
        self._postings_df = self.spark.read.parquet(*self._postings_files)
        self._docmap_df = self.spark.read.parquet(*self._docmap_files)
        self._dicts_df = self.spark.read.parquet(*self._dict_files)
        #: term → global df cache (SolrIndexSearcher filterCache spirit)
        self._df_cache: dict[str, int] = {}
        self._field_card_cache: dict[str, int] = {}
        # MatchAll facet partials cache (UnInvertedField / FieldCache
        # analog): keyed (field, group_by, missing), bounded by the 3
        # docvalues fields × flags; safe because a searcher is pinned
        # to ONE snapshot (deletes/merges produce a NEW searcher, so
        # the cached counts can never go stale). facets.facet_field
        # owns population; entries persist for the searcher's life.
        self._facet_cache: dict[tuple, object] = {}
        #: filterCache: canonical fq key → SegBitsCache handle over
        #: per-segment packed-bitset sidecar files (see cache_filter)
        self._fq_cache: dict[tuple, SegBitsCache] = {}
        #: queryResultCache: full-spec key (k=0) → SegBitsCache handle
        #: over per-segment packed HIT bitsets (see cache_docset)
        self._docset_cache: dict = {}
        #: liveDocs analog: tombstoned (conv_id, turn_idx) keys.
        #: Shipped to tasks via a Spark BROADCAST (serialized once,
        #: cached per executor/worker) — capturing the raw set in UDF
        #: closures re-pickles it into every stage of every query
        #: (~2s/query at 50k tombstones; measured).
        self.deleted_keys: frozenset = frozenset()
        self._deleted_bc = None
        tb = self.manifest.tombstones
        if tb:
            import numpy as np
            import pyarrow.parquet as pq

            t = pq.read_table(os.path.join(index_root, tb["path"]))
            convs = t.column("conv_id").to_pylist()
            turns = t.column("turn_idx").to_pylist()
            self.deleted_keys = frozenset(zip(convs, turns))
            arr = np.sort(
                np.array([f"{c}|{i}".encode() for c, i in zip(convs, turns)])
            )
            self._deleted_bc = spark.sparkContext.broadcast(arr)

    def persist(self) -> "IndexSearcher":
        """Serving mode: pin the postings table in executor memory
        (the OS-page-cache warm-index analog). ~15-20%
        off warm query latency in local mode; on a cluster it removes
        object-store reads from the query path entirely."""
        self._postings_df = self._postings_df.persist()
        self._postings_df.count()  # materialize
        return self

    # -- filterCache (SolrIndexSearcher#getDocSet fq bitsets) ----------

    #: solrconfig filterCache size analog: bounded entries, oldest out
    MAX_FILTER_CACHE = 64

    @staticmethod
    def _filter_key(spec: BooleanSpec) -> tuple:
        """Canonical fq identity — every non-scoring constraint kind
        that rides the filter mask path (the filter_cols inventory)."""
        return (
            tuple(spec.filters), tuple(spec.not_filters),
            tuple(spec.range_filters), tuple(spec.in_filters),
            tuple(spec.exists_filters), tuple(spec.missing_filters),
        )

    def _cache_entry_dir(self, kind: str, key) -> str:
        """Sidecar directory for one cache entry: namespaced by the
        searcher's snapshot (entries can never cross snapshots) and
        the md5 of the canonical key. Lives beside ``segments/`` on
        the index's own storage; gc_snapshots/replication never
        enumerate it."""
        import hashlib

        digest = hashlib.md5(repr(key).encode()).hexdigest()[:16]
        d = os.path.join(
            self.index_root, "querycache",
            f"snap{self.manifest.snapshot_id}", f"{kind}-{digest}",
        )
        os.makedirs(d, exist_ok=True)
        return d

    def cache_filter(self, spec: BooleanSpec) -> bool:
        """Populate the filterCache for ``spec``'s fq constraints: one
        seg-driver job evaluates the filter mask per segment, packs it
        to a bitset (maxDoc/8 bytes — exactly Lucene's per-core
        FixedBitSet cost model) and writes it as a per-segment sidecar
        file IN THE SAME TASK (SegBitsCache: executor/storage-resident
        bits; the driver keeps only per-segment counts). Subsequent
        ``search`` calls whose fq constraints match the cached key
        skip BOTH the per-row predicate evaluation AND the parquet
        read of the fq columns (the docmap scan shrinks to the base
        columns). Returns False (no-op) for a filterless spec.

        Unlike Solr the cache warms EXPLICITLY (Solr caches the bitset
        as a byproduct of fq execution; here the masks materialize
        inside executor tasks, so a dedicated bounded job builds
        them). Entries are safe for the searcher's lifetime — a
        searcher is pinned to one snapshot (the facet-cache
        precedent); deletes/merges produce a NEW searcher. Capped at
        MAX_FILTER_CACHE entries, oldest evicted and its sidecar dir
        removed.

        ref: solr/core/src/java/org/apache/solr/search/
        SolrIndexSearcher.java (getDocSet / filterCache),
        solr/core/src/java/org/apache/solr/search/DocSetCollector.java
        """
        import numpy as np

        key = self._filter_key(spec)
        if not any(key):
            return False
        if key in self._fq_cache:
            return True
        fspec = BooleanSpec(
            filters=spec.filters, not_filters=spec.not_filters,
            range_filters=spec.range_filters, in_filters=spec.in_filters,
            exists_filters=spec.exists_filters,
            missing_filters=spec.missing_filters,
        )
        seg_dirs = self.seg_dir_by_id
        dm_cols = filter_cols(fspec, ["doc_ord"])
        cdir = self._cache_entry_dir("fq", key)

        def one(pdf):
            import pandas as pd
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
            ).to_pandas()
            mask = np.asarray(filter_mask(dm, fspec), dtype=np.uint8)
            _write_bits(cdir, seg_id, np.packbits(mask).tobytes())
            return pd.DataFrame(
                {"seg_id": [seg_id], "n": [len(dm)],
                 "pop": [int(mask.sum())]}
            )

        rows = (
            self.seg_driver()
            .groupBy("seg_id")
            .applyInPandas(one, "seg_id int, n long, pop long")
            .collect()  # O(#segments) count rows — never the bits
        )
        meta = {int(r.seg_id): (int(r.n), int(r.pop)) for r in rows}
        if len(self._fq_cache) >= self.MAX_FILTER_CACHE:
            self._fq_cache.pop(next(iter(self._fq_cache))).destroy()
        self._fq_cache[key] = SegBitsCache(cdir, meta)
        return True

    def _fq_cached_bc(self, spec: BooleanSpec):
        """SegBitsCache handle over the per-segment fq bitsets for
        specs whose fq constraints hit the cache, else None."""
        return self._fq_cache.get(self._filter_key(spec))

    # -- queryResultCache (SolrIndexSearcher#getDocSet full-spec) ------

    #: solrconfig queryResultCache size analog
    MAX_DOCSET_CACHE = 32

    @staticmethod
    def _docset_key(spec: BooleanSpec) -> BooleanSpec:
        """Canonical DocSet identity: the spec minus paging (k) —
        every page of a request shares one DocSet, Solr's
        queryResultCache windowing spirit. Multiterm specs key on
        their REWRITTEN form (cache_docset rewrites before keying;
        probes with the unrewritten original simply miss — a probe
        must never launch a dictionary-expansion job)."""
        from dataclasses import replace as _replace

        return _replace(spec, k=0)

    def cache_docset(self, spec: BooleanSpec) -> None:
        """Warm the FULL-spec DocSet as per-segment packed bitsets
        (getDocSet + queryResultCache): ONE seg-driver job computes
        each segment's live hit mask (scoring match ∩ fq ∩ liveDocs —
        tombstones bake in, safe because a searcher is pinned to one
        snapshot) and writes maxDoc/8 bytes per segment as a sidecar
        file in the same task (SegBitsCache — the driver holds only
        per-segment counts). On a hit: ``docset_count`` answers from
        the warm-time popcounts (ZERO jobs — the /select numFound),
        ``docset`` serves keys without postings or fq evaluation, and
        the facet sparse pass skips match_segment AND the fq docvalues
        columns entirely (see facets.segment_partials). Bounded like
        the filterCache: MAX_DOCSET_CACHE entries, oldest evicted and
        its sidecar dir removed.

        ref: solr/core/src/java/org/apache/solr/search/
        SolrIndexSearcher.java (getDocSet / queryResultCache)"""
        import numpy as np

        if spec.needs_rewrite:
            spec = self.rewrite(spec)
        key = self._docset_key(spec)
        if key in self._docset_cache:
            return
        lspec = key
        seg_dirs = self.seg_dir_by_id
        # the warm task needs the doc keys ONLY to bake the liveDocs
        # mask in; with no tombstones the scan drops the key columns
        # (10M string reads per warm at 10M turns, otherwise)
        base_cols = _BASE_COLS if self.deleted_keys else [
            "doc_ord", "doc_len",
        ]
        dm_cols = filter_cols(lspec, base_cols)
        deleted_bc = self._deleted_bc
        lookup = list(lspec.lookup_terms)
        cdir = self._cache_entry_dir("ds", key)

        def one(pdf):
            import pandas as pd
            import pyarrow.parquet as pq

            from lucene_solr_spark.query.scorer import match_segment

            seg_id = int(pdf["seg_id"].iloc[0])
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
            ).to_pandas()
            allowed = apply_deletes(
                filter_mask(dm, lspec), dm,
                deleted_bc.value if deleted_bc else None,
            )
            term_rows = {}
            if lookup:
                post_tbl = pq.read_table(
                    f"{seg_dirs[seg_id]}/postings.parquet",
                    filters=[("term", "in", lookup)],
                    columns=postings_task_columns(lspec),
                ).to_pandas()
                term_rows = {r["term"]: r for _, r in post_tbl.iterrows()}
            hits = match_segment(
                lspec, term_rows, len(dm), allowed,
                int(dm["doc_len"].max()) if len(dm) else 0,
            )
            mask = np.zeros(len(dm), dtype=np.uint8)
            mask[hits] = 1
            _write_bits(cdir, seg_id, np.packbits(mask).tobytes())
            return pd.DataFrame(
                {"seg_id": [seg_id], "n": [len(dm)],
                 "pop": [int(mask.sum())]}
            )

        rows = (
            self.seg_driver()
            .groupBy("seg_id")
            .applyInPandas(one, "seg_id int, n long, pop long")
            .collect()  # O(#segments) count rows — never the bits
        )
        meta = {int(r.seg_id): (int(r.n), int(r.pop)) for r in rows}
        if len(self._docset_cache) >= self.MAX_DOCSET_CACHE:
            self._docset_cache.pop(
                next(iter(self._docset_cache))
            ).destroy()
        self._docset_cache[key] = SegBitsCache(cdir, meta)

    def _docset_cached_bc(self, spec: BooleanSpec):
        """SegBitsCache handle over the per-segment hit bitsets on a
        queryResultCache hit, else None."""
        return self._docset_cache.get(self._docset_key(spec))

    def docset_count(self, spec: BooleanSpec) -> int:
        """|DocSet| — on a queryResultCache hit this sums the
        warm-time per-segment popcounts (zero Spark jobs, zero IO —
        the numFound fast path); else one bounded count job."""
        bc = self._docset_cached_bc(spec)
        if bc is not None:
            return bc.popcount()
        return self.docset(spec).count()

    # -- table handles -------------------------------------------------
    def postings(self) -> DataFrame:
        return self._postings_df

    def docmap(self) -> DataFrame:
        """Docvalues view — with liveDocs applied (Lucene docvalues
        iteration honors deletes), via a broadcast anti-join only when
        tombstones exist (zero plan change otherwise)."""
        if not self.deleted_keys:
            return self._docmap_df
        dead = self.spark.createDataFrame(
            sorted(self.deleted_keys), "conv_id string, turn_idx int"
        )
        return self._docmap_df.join(
            F.broadcast(dead), ["conv_id", "turn_idx"], "left_anti"
        )

    def dicts(self) -> DataFrame:
        return self._dicts_df

    def field_cardinality(self, field: str) -> int:
        """Global distinct-term count of a docvalues field (cached —
        one tiny dictionary aggregation on first use). Drives the
        facet method choice, the Solr ``facet.method`` heuristic:
        SimpleFacets picks enum/fc by field term count vs request
        size; we pick exact-single-shuffle vs two-phase refine the
        same way (see facets.facet_field)."""
        card = self._field_card_cache.get(field)
        if card is None:
            card = (
                self._dicts_df.filter(F.col("field") == field)
                .select("term").distinct().count()
            )
            self._field_card_cache[field] = card
        return card

    # -- Weight binding ------------------------------------------------
    def global_df(self, terms: list[str]) -> dict[str, int]:
        """Index-wide doc freq per term (cached). One tiny aggregation
        over the term-pruned postings scan for uncached terms."""
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            rows = (
                self.postings()
                .filter(F.col("term").isin(missing))
                .groupBy("term")
                .agg(F.sum("df").alias("df"))
                .collect()
            )
            found = {r.term: int(r.df) for r in rows}
            for t in missing:
                self._df_cache[t] = found.get(t, 0)
        return {t: self._df_cache[t] for t in terms}

    def global_idf(self, terms: list[str]) -> dict[str, float]:
        """idf from index-wide df (BM25Similarity.java formula)."""
        n = self.manifest.n_docs
        dfs = self.global_df(terms)
        return {
            t: math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in terms
        }

    # -- search --------------------------------------------------------
    def score_hits(self, spec: BooleanSpec, k: int | None = None) -> DataFrame:
        """UNSORTED scored hits: per-segment top-k rows (all matching
        turns when k is None) with raw float64 scores — no global sort.

        This is the composable building block: :meth:`search` adds the
        pinned TakeOrdered; parent-block aggregation
        (:meth:`search_conversations`) and rerank consume it directly,
        avoiding a degenerate single-task sort of the full hit set
        that a giant-k ``orderBy().limit()`` would plan."""
        if spec.needs_rewrite:
            spec = self.rewrite(spec)
        if spec.min_should_match > len(spec.should):
            # unsatisfiable mm — e.g. a multiterm pattern that matched
            # NOTHING in the dictionary (Lucene's empty rewrite with
            # mm=1): zero hits, not an error
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        if not spec.scoring_terms:
            # Lucene rejects pure-negative scored queries (QueryUtils
            # .makeQueryable wraps them for filters, not scoring) — and
            # bm25_df.search raises identically.
            raise ValueError("query has no scoring terms")
        all_terms = list(spec.lookup_terms)
        idf = self.global_idf(all_terms)  # must_not idf unused but keyed
        if spec.boosts:
            # BoostQuery: contribution AND WAND upper bound both scale
            # linearly in idf, so folding the boost into idf applies it
            # everywhere consistently (pruning stays sound).
            bm = spec.boost_map
            idf = {t: v * bm.get(t, 1.0) for t, v in idf.items()}
        avgdl = self.manifest.avgdl
        seg_dirs = self.seg_dir_by_id
        fq_bc = self._fq_cached_bc(spec)
        # filterCache hit: the fq bitset replaces per-row predicate
        # evaluation AND the scan drops the fq columns entirely
        dm_cols = _BASE_COLS if fq_bc is not None else filter_cols(
            spec, _BASE_COLS
        )
        seg_k = (1 << 62) if k is None else k
        deleted_bc = self._deleted_bc

        post = self.postings().filter(F.col("term").isin(all_terms))
        if not spec.needs_positions:
            # the position payload (~60% of postings bytes at 10M
            # turns, measured) never leaves the parquet reader for a
            # pure term/boolean spec — Lucene's .pos-file IO contract
            post = post.drop("pos_offs", "pos_bytes")

        # fields the fq mask actually touches (pandas-materialized in
        # tasks; everything else stays Arrow/numpy)
        fq_fields = sorted(
            {f for f in spec.exists_filters}
            | {f for f in spec.missing_filters}
            | {f for f, _ in spec.filters}
            | {f for f, _ in spec.in_filters}
            | {f for f, _ in spec.not_filters}
            | {f for f, _, _ in spec.range_filters}
        )
        has_deletes = bool(self.deleted_keys)

        def run_seg(pdf):
            import numpy as np
            import pandas as pd
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            # per-segment docvalues/norms read — segment-local, no
            # shuffle, and ARROW-NATIVE: converting a whole segment's
            # docmap to pandas materializes every conv_id as a python
            # string — 10M objects per query at 10M turns, the
            # measured corpus-width latency term. Only the fq columns,
            # the delete keys (when tombstones exist) and the top-k
            # OUTPUT rows ever cross into pandas.
            dm_t = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
            )  # written sorted by doc_ord
            doc_len = np.asarray(
                dm_t.column("doc_len").to_numpy(zero_copy_only=False),
                np.int64,
            )
            if fq_bc is not None:
                bits, n = fq_bc.get(seg_id)
                fq_mask = np.unpackbits(
                    np.frombuffer(bits, np.uint8), count=n
                ).astype(bool)
            elif fq_fields:
                fq_mask = filter_mask(
                    dm_t.select(fq_fields).to_pandas(), spec
                )
            else:
                fq_mask = None
            if has_deletes:
                allowed = apply_deletes(
                    fq_mask,
                    dm_t.select(["conv_id", "turn_idx"]).to_pandas(),
                    deleted_bc.value if deleted_bc else None,
                )
            else:
                allowed = fq_mask
            term_rows = {r["term"]: r for _, r in pdf.iterrows()}
            docs, scores = score_segment(
                spec, term_rows, idf, avgdl, doc_len, allowed, seg_k
            )
            if len(docs) == 0:
                return pd.DataFrame(columns=["conv_id", "turn_idx", "score"])
            sel = dm_t.select(["conv_id", "turn_idx"]).take(docs).to_pandas()
            sel["score"] = scores
            return sel

        return post.groupBy("seg_id").applyInPandas(run_seg, schema=RESULT_SCHEMA)

    def search(self, spec: BooleanSpec, round_to: int | None = None) -> DataFrame:
        hits = self.score_hits(spec, k=spec.k)
        if round_to is not None:
            hits = hits.withColumn("score", F.round("score", round_to))
        return hits.orderBy(F.desc("score"), "conv_id", "turn_idx").limit(spec.k)

    def rerank(
        self,
        spec: BooleanSpec,
        rr_spec: BooleanSpec,
        re_rank_docs: int,
        weight: float,
        k: int | None = None,
        round_to: int | None = 4,
    ) -> DataFrame:
        """ReRankQParserPlugin (``rq={!rerank ...}``): the main query's
        top ``re_rank_docs`` are RE-SCORED as main + weight × the
        rerank query's score; head docs the rerank query does not
        match keep their main score (the boost is additive, never
        restrictive — the match set is pinned by the first pass).

        Combination uses ROUNDED components (round_to dp) on both
        engines so cross-engine float noise cannot flip the blended
        order — the same pinned rule as the cross-field DisMax blend.

        Shuffle shape: the head is bounded (re_rank_docs rows, one
        TakeOrdered); the rerank query's scored hits stream PAST a
        broadcast semi-filter of the head keys (term-pruned postings
        pass, narrow output ≤ re_rank_docs rows), and the bounded
        boost frame broadcast-joins back onto the head. The corpus
        never shuffles; Solr's ReRankCollector likewise re-scores
        only the first-pass top-N.

        ref: solr/core/src/java/org/apache/solr/search/
             ReRankQParserPlugin.java (ReRankQuery/ReRankCollector:
             combined = firstPassScore + reRankWeight * secondPassScore
             when the rerank query matches)
        """
        from dataclasses import replace

        head = self.search(replace(spec, k=re_rank_docs), round_to=round_to)
        rr = self.score_hits(rr_spec, k=None)
        if round_to is not None:
            rr = rr.withColumn("score", F.round("score", round_to))
        keys = head.select("conv_id", "turn_idx")
        boost = (
            rr.join(F.broadcast(keys), ["conv_id", "turn_idx"], "left_semi")
            .withColumnRenamed("score", "rr_score")
        )
        comb = F.col("score") + float(weight) * F.coalesce(
            F.col("rr_score"), F.lit(0.0)
        )
        if round_to is not None:
            comb = F.round(comb, round_to)
        out = (
            head.join(F.broadcast(boost), ["conv_id", "turn_idx"], "left")
            .withColumn("score", comb)
            .drop("rr_score")
        )
        k = spec.k if k is None else k
        return out.orderBy(F.desc("score"), "conv_id", "turn_idx").limit(k)

    def cursor_page(
        self,
        spec: BooleanSpec,
        k: int | None = None,
        cursor: tuple[float, str, int] | None = None,
        round_to: int | None = None,
    ) -> DataFrame:
        """Deep paging through the index engine (W4, VERDICT r2 item
        5): keyset predicate on the pinned total order (score desc,
        conv_id asc, turn_idx asc) instead of offset paging.

        ``cursor`` is None for the first page, else the (score,
        conv_id, turn_idx) of the LAST row of the previous page — the
        serialized totalOrder mark. The page is the top-k of the hit
        set strictly AFTER the mark. Like the reference, page cost
        does not grow with depth: no k+offset heap, no global sort of
        skipped rows — each page is one distributed TakeOrdered of k
        rows over the keyset-filtered hits. When round_to is given the
        keyset compares ROUNDED scores (the values the client saw), so
        marks round-trip exactly.

        ref: solr/core/src/java/org/apache/solr/search/CursorMark.java,
             solr/core/src/java/org/apache/solr/handler/component/
             QueryComponent.java (cursorMark path)
        """
        k = spec.k if k is None else k
        # per-segment top-k would be unsound under a cursor: a page-N
        # row may rank below a segment's first k. Score all matches
        # (unsorted), filter, TakeOrdered.
        hits = self.score_hits(spec, k=None)
        if round_to is not None:
            hits = hits.withColumn("score", F.round("score", round_to))
        if cursor is not None:
            s0, c0, t0 = cursor
            after_mark = (
                (F.col("score") < s0)
                | ((F.col("score") == s0) & (F.col("conv_id") > c0))
                | (
                    (F.col("score") == s0)
                    & (F.col("conv_id") == c0)
                    & (F.col("turn_idx") > t0)
                )
            )
            hits = hits.filter(after_mark)
        return hits.orderBy(F.desc("score"), "conv_id", "turn_idx").limit(k)

    @staticmethod
    def cursor_clauses(clauses) -> list[tuple[str, bool]]:
        """A field-sort cursor's FULL total order: the request clauses
        plus the pinned (conv_id, turn_idx) tiebreak for whichever of
        the two the request didn't name (Solr's uniqueKey-in-sort
        cursor requirement, closed by the engine's pinned keys)."""
        full = list(clauses)
        present = {f for f, _ in full}
        for tb in ("conv_id", "turn_idx"):
            if tb not in present:
                full.append((tb, True))
        return full

    def cursor_page_fields(
        self,
        spec: BooleanSpec,
        clauses,
        k: int,
        cursor: tuple | None = None,
    ) -> DataFrame:
        """cursorMark deep paging under a FIELD sort (r5 — Solr's
        CursorMark works with any sort that closes a total order):
        keyset predicate = lexicographic after-mark over the full
        clause list, hits = DocSet keys joined to the PRUNED docmap
        sort columns, page = one distributed TakeOrdered of k rows.
        Like the score cursor, page cost does not grow with depth.
        Restricted to never-null docvalues fields (the parse layer
        enforces it) so the keyset compare needs no tri-state logic.

        ref: solr/core/src/java/org/apache/solr/search/CursorMark.java
        (sortSpec totalOrder + post-filter)"""
        full = self.cursor_clauses(clauses)
        extra = [f for f, _ in full if f not in ("conv_id", "turn_idx")]
        dm = self.docmap().select("conv_id", "turn_idx", *extra)
        hits = self.docset(spec).join(dm, ["conv_id", "turn_idx"])
        if cursor is not None:
            pred = None
            eq = None
            for (fld, asc), val in zip(full, cursor):
                c = F.col(fld)
                gt = (c > F.lit(val)) if asc else (c < F.lit(val))
                term = gt if eq is None else (eq & gt)
                pred = term if pred is None else (pred | term)
                this_eq = c == F.lit(val)
                eq = this_eq if eq is None else (eq & this_eq)
            hits = hits.filter(pred)
        order = [
            F.col(f).asc() if asc else F.col(f).desc() for f, asc in full
        ]
        cols = ["conv_id", "turn_idx"] + extra
        return hits.orderBy(*order).limit(k).select(*cols)

    # -- MoreLikeThis --------------------------------------------------
    def interesting_terms(
        self, text: str, max_terms: int = 5
    ) -> list[tuple[str, float]]:
        """MLT interesting-terms surface (``MoreLikeThis.java#
        retrieveInterestingTerms`` / Solr ``mlt.interestingTerms=
        details``): the source text's terms ranked by tf x idf under
        the pinned BM25 idf, rounded 6dp pre-ranking so the selection
        boundary is engine-independent, tiebreak term asc."""
        from collections import Counter

        from lucene_solr_spark.analyzer import tokenize_one

        tf = Counter(tokenize_one(text))
        idf = self.global_idf(list(tf))
        ranked = sorted(
            ((round(c * idf[t], 6), t) for t, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )
        return [(t, s) for s, t in ranked[:max_terms]]

    def more_like_this(
        self,
        conv_id: str,
        turn_idx: int,
        text: str,
        max_terms: int = 5,
        k: int = 10,
        round_to: int | None = None,
    ) -> DataFrame:
        """MoreLikeThis (``lucene/queries/src/java/org/apache/lucene/
        queries/mlt/MoreLikeThis.java``): pick the source doc's most
        interesting terms by tf × idf (our pinned BM25 idf; scores
        rounded 6dp before ranking so the selection boundary is
        engine-independent, tiebreak term asc), then run an OR query
        excluding the source doc itself."""
        terms = tuple(t for t, _ in self.interesting_terms(text, max_terms))
        hits = self.search(
            BooleanSpec(should=terms, min_should_match=1, k=k + 1),
            round_to=round_to,
        )
        return (
            hits.filter(
                ~((F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx))
            )
            .orderBy(F.desc("score"), "conv_id", "turn_idx")
            .limit(k)
        )

    def mlt_batch(
        self,
        sources: list[tuple[str, int, str]],
        max_terms: int = 5,
        k: int = 5,
        round_to: int | None = None,
        min_tf: int = 1,
        min_df: int = 1,
        boost: bool = False,
    ) -> DataFrame:
        """Batched MoreLikeThis — the /select ``mlt=true`` component
        (MoreLikeThisComponent runs one MLT query PER doclist doc;
        at cluster scale that is |page| sequential searches, so this
        engine batches them into ONE distributed pass): per-source
        interesting terms rank driver-side on the bounded page
        (tf × idf, 6dp pre-round, tiebreak term asc — the
        interesting_terms contract), ONE dictionary probe serves the
        union vocabulary's dfs, ONE per-segment Arrow pass decodes
        the term-pruned postings into (term, cand, contrib) rows
        (Σ df(term) rows — never corpus-wide), then a broadcast
        source-map join + partial-aggregating groupBy((src, cand))
        + per-source top-k window. Self-matches are excluded like
        ``more_like_this``. Output keyed by the source doc (Solr's
        moreLikeThis NamedList keys on the uniqueKey), ordered
        (conv_id, turn_idx, sim_rank).

        ref: solr/core/src/java/org/apache/solr/handler/component/
             MoreLikeThisComponent.java,
             lucene/queries/src/java/org/apache/lucene/queries/mlt/
             MoreLikeThis.java"""
        from collections import Counter

        import numpy as np

        from lucene_solr_spark.analyzer import tokenize_one
        from lucene_solr_spark.query.model import B, K1
        from lucene_solr_spark.query.scorer import TermPostings

        src_tf = {
            (cid, tid): Counter(tokenize_one(text))
            for cid, tid, text in sources
        }
        union = sorted({t for tf in src_tf.values() for t in tf})
        if not union or not sources:
            return self.spark.createDataFrame(
                [],
                "conv_id string, turn_idx int, sim_conv_id string, "
                "sim_turn_idx int, score double, sim_rank long",
            )
        # ONE dictionary probe serves both the dfs (the mlt.mindf
        # gate) and the idfs (the interesting-term weights — same
        # pinned BM25Similarity formula as global_idf)
        dfs = self.global_df(union)
        n_docs = self.manifest.n_docs
        idf = {
            t: math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
            for t in union
        }
        src_rows = []
        int_union: set[str] = set()
        for (cid, tid), tf in src_tf.items():
            ranked = sorted(
                ((round(c * idf[t], 6), t) for t, c in tf.items()
                 if c >= min_tf and dfs[t] >= min_df),
                key=lambda x: (-x[0], x[1]),
            )[:max_terms]
            # mlt.boost (MoreLikeThis#setBoost): weight each
            # interesting term by its score RATIO to the best term of
            # ITS source (Lucene's tq.setBoost(myScore / bestScore));
            # boost=false keeps the flat 1.0 the plain query uses
            best = ranked[0][0] if ranked else 0.0
            for sc, t in ranked:
                b = (sc / best) if (boost and best > 0) else 1.0
                src_rows.append((cid, tid, t, float(b)))
                int_union.add(t)
        src_map = self.spark.createDataFrame(
            src_rows,
            "src_conv_id string, src_turn_idx int, term string, "
            "boost double",
        )
        avgdl = self.manifest.avgdl
        seg_dirs = self.seg_dir_by_id
        deleted_bc = self._deleted_bc
        lidf = {t: idf[t] for t in int_union}

        def run_seg(pdf):
            import pandas as pd
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=_BASE_COLS
            ).to_pandas()
            doc_len = dm["doc_len"].to_numpy("int64")
            # docmap read site: liveDocs tombstones mask before any
            # candidate leaves the task
            live = apply_deletes(
                None, dm, deleted_bc.value if deleted_bc else None
            )
            frames = []
            for _, row in pdf.iterrows():
                t = row["term"]
                d, tf = TermPostings(row, 0.0).decode_all()
                if live is not None:
                    m = np.asarray(live)[d]
                    d, tf = d[m], tf[m]
                if len(d) == 0:
                    continue
                dl = doc_len[d]
                contrib = (
                    lidf[t] * (tf * (K1 + 1))
                    / (tf + K1 * (1 - B + B * dl / avgdl))
                )
                sel = dm.iloc[d]
                frames.append(pd.DataFrame({
                    "term": t,
                    "conv_id": sel["conv_id"].to_numpy(),
                    "turn_idx": sel["turn_idx"].to_numpy(),
                    "contrib": contrib,
                }))
            cols = ["term", "conv_id", "turn_idx", "contrib"]
            if not frames:
                return pd.DataFrame(columns=cols)
            return pd.concat(frames, ignore_index=True)[cols]

        contribs = (
            self.postings()
            .filter(F.col("term").isin(sorted(int_union)))
            .groupBy("seg_id")
            .applyInPandas(
                run_seg,
                "term string, conv_id string, turn_idx int, contrib double",
            )
        )
        scored = (
            contribs.join(F.broadcast(src_map), "term")
            .filter(
                ~((F.col("conv_id") == F.col("src_conv_id"))
                  & (F.col("turn_idx") == F.col("src_turn_idx")))
            )
            .groupBy("src_conv_id", "src_turn_idx", "conv_id", "turn_idx")
            .agg(F.sum(F.col("contrib") * F.col("boost")).alias("score"))
        )
        if round_to is not None:
            scored = scored.withColumn("score", F.round("score", round_to))
        w = Window.partitionBy("src_conv_id", "src_turn_idx").orderBy(
            F.desc("score"), F.asc("conv_id"), F.asc("turn_idx")
        )
        return (
            scored.withColumn("sim_rank", F.row_number().over(w).cast("long"))
            .filter(F.col("sim_rank") <= k)
            .select(
                F.col("src_conv_id").alias("conv_id"),
                F.col("src_turn_idx").alias("turn_idx"),
                F.col("conv_id").alias("sim_conv_id"),
                F.col("turn_idx").alias("sim_turn_idx"),
                "score", "sim_rank",
            )
            .orderBy("conv_id", "turn_idx", "sim_rank")
        )

    # -- debugQuery explain --------------------------------------------
    def explain(
        self,
        spec: BooleanSpec,
        conv_id: str,
        turn_idx: int,
        round_to: int | None = None,
    ) -> DataFrame:
        """debugQuery Explanation analog: the per-term BM25 breakdown
        (tf, df, idf, contrib) for ONE doc — the row-level audit trail
        behind a score. Physical: one pruned docmap probe locates the
        doc's (segment, ord, norm); one task decodes ONLY the query
        terms' postings blocks of THAT segment for that single ord
        (block skip list → one block per term). Nothing corpus-sized
        moves. Matching clauses only (Lucene explain omits absent
        terms); per-term boosts fold into contrib like scoring.

        ref: lucene/core/src/java/org/apache/lucene/search/
             IndexSearcher.java#explain, BM25Similarity.java#explain"""
        import numpy as np

        from lucene_solr_spark.query.model import B, K1
        from lucene_solr_spark.query.scorer import TermPostings, _phrase_freqs

        if spec.needs_rewrite:
            spec = self.rewrite(spec)
        terms = list(spec.scoring_terms)
        pf_terms = [t for ph in spec.pf_phrases for t in ph]
        scan_terms = list(dict.fromkeys(terms + pf_terms))
        schema = "term string, tf long, df long, idf double, contrib double"
        loc = (
            self.docmap()
            .filter(
                (F.col("conv_id") == conv_id)
                & (F.col("turn_idx") == turn_idx)
            )
            .select("seg_id", "doc_ord", "doc_len")
            .collect()
        )
        if not loc or not terms:
            return self.spark.createDataFrame([], schema)
        seg_id, doc_ord, doc_len = (
            int(loc[0].seg_id), int(loc[0].doc_ord), float(loc[0].doc_len)
        )
        dfs = self.global_df(scan_terms)
        n, avgdl = self.manifest.n_docs, self.manifest.avgdl
        bm = spec.boost_map
        pf_phrases, pf_boost = spec.pf_phrases, spec.pf_boost
        # stride for the phrase matcher: positions are < the doc's own
        # length; other candidate docs are pruned before key-building,
        # but their positions flow through — bound by the segment max
        seg_max_dl = int(doc_len)
        if pf_phrases:
            # the manifest's committed per-segment stats carry max_dl
            # (no extra Spark job); pre-max_dl manifests fall back to
            # the docmap scan
            mdl = self.manifest.seg_max_dl(seg_id)
            seg_max_dl = (
                int(mdl)
                if mdl is not None
                else int(
                    self.docmap()
                    .filter(F.col("seg_id") == seg_id)
                    .agg(F.max("doc_len"))
                    .collect()[0][0]
                )
            )

        def run(pdf):
            import pandas as pd

            term_rows = {r["term"]: r for _, r in pdf.iterrows()}
            rows = []
            for t in term_rows:
                if t not in terms:
                    continue  # pf-only terms never score alone
                p = TermPostings(term_rows[t], 0.0)
                blocks = p.blocks_for_docs(np.array([doc_ord]))
                d, tf = p.decode_blocks(blocks)
                m = d == doc_ord
                if m.any():
                    rows.append((t, int(tf[m][0])))
            for ph in pf_phrases:
                # optional PhraseQuery clause (edismax pf): explain it
                # like Lucene does — label, phrase freq
                tps = [
                    TermPostings(term_rows[t], 0.0)
                    if t in term_rows else None
                    for t in ph
                ]
                pdocs, ptf = _phrase_freqs(tps, seg_max_dl)
                m = pdocs == doc_ord
                if m.any():
                    rows.append(('"' + " ".join(ph) + '"', int(ptf[m][0])))
            return pd.DataFrame(rows, columns=["term", "tf"])

        tfdf = (
            self.postings()
            .filter(
                (F.col("seg_id") == seg_id) & F.col("term").isin(scan_terms)
            )
            .groupBy("seg_id")
            .applyInPandas(run, "term string, tf long")
        )

        def _idf(t: str) -> float:
            return math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))

        meta_rows = [
            (t, dfs[t], float(bm.get(t, 1.0)), _idf(t)) for t in terms
        ]
        for ph in pf_phrases:
            # phrase idf = Σ term idfs (duplicates counted, boosts
            # folded), weighted by pf_boost; df column carries 0 (the
            # phrase has no dictionary df — Lucene explain shows the
            # per-term stats inside the nested explanation instead)
            isum = sum(_idf(t) * float(bm.get(t, 1.0)) for t in ph)
            meta_rows.append(
                ('"' + " ".join(ph) + '"', 0, float(pf_boost), isum)
            )
        meta = self.spark.createDataFrame(
            meta_rows, "term string, df long, boost double, idf double"
        )
        norm = K1 * (1 - B + B * doc_len / avgdl)
        contrib = (
            F.col("boost") * F.col("idf")
            * (F.col("tf") * (K1 + 1)) / (F.col("tf") + norm)
        )
        out = (
            tfdf.join(F.broadcast(meta), "term")
            .withColumn("contrib", contrib)
            .select("term", "tf", "df", "idf", "contrib")
        )
        if round_to is not None:
            out = out.withColumn("idf", F.round("idf", round_to)).withColumn(
                "contrib", F.round("contrib", round_to)
            )
        return out.orderBy("term")

    def explain_batch(
        self,
        spec: BooleanSpec,
        keys: list[tuple[str, int]],
        round_to: int | None = None,
    ) -> DataFrame:
        """debugQuery for a PAGE of docs in ONE pass — the /select
        ``debug=true`` leg (Solr's DebugComponent attaches an
        Explanation per doclist doc; :meth:`explain` launches a
        per-doc probe, so a 10-row page would cost 10 jobs): one
        bounded docmap probe locates every page doc's (segment, ord,
        norm), then one per-segment Arrow pass decodes ONLY the
        scoring terms' postings blocks covering those ords (block
        skip list — nothing corpus-sized moves), and the per-term
        meta (df, idf, boost) broadcasts onto the (doc, term, tf)
        rows. Same per-row contract as :meth:`explain`: matching
        clauses only, contribs sum to the ranker's score. pf specs
        route to the per-doc surface (the phrase bonus needs the
        position machinery).

        ref: solr/core/src/java/org/apache/solr/handler/component/
             DebugComponent.java (explain per doclist doc),
             lucene/core/.../IndexSearcher.java#explain"""
        import numpy as np

        from lucene_solr_spark.query.model import B, K1
        from lucene_solr_spark.query.scorer import TermPostings

        if spec.needs_rewrite:
            spec = self.rewrite(spec)
        if spec.pf_phrases:
            raise ValueError(
                "explain_batch covers term scoring; pf specs need the "
                "per-doc explain surface")
        terms = list(spec.scoring_terms)
        schema = (
            "conv_id string, turn_idx int, term string, tf long, "
            "df long, idf double, contrib double"
        )
        if not keys or not terms:
            return self.spark.createDataFrame([], schema)
        keys_df = self.spark.createDataFrame(
            list(keys), "conv_id string, turn_idx int"
        )
        loc = (
            self.docmap()
            .join(F.broadcast(keys_df), ["conv_id", "turn_idx"])
            .select("seg_id", "doc_ord", "doc_len", "conv_id", "turn_idx")
            .collect()  # bounded: ≤ |page| rows
        )
        if not loc:
            return self.spark.createDataFrame([], schema)
        by_seg: dict[int, list] = {}
        for r in loc:
            by_seg.setdefault(int(r.seg_id), []).append(
                (int(r.doc_ord), r.conv_id, int(r.turn_idx))
            )
        dfs = self.global_df(terms)
        n, avgdl = self.manifest.n_docs, self.manifest.avgdl
        bm = spec.boost_map
        seg_ids = sorted(by_seg)

        def run_seg(pdf):
            import pandas as pd

            seg_id = int(pdf["seg_id"].iloc[0])
            want = by_seg[seg_id]
            ords = np.array([w[0] for w in want], dtype=np.int64)
            order = np.argsort(ords)
            s_ords = ords[order]
            rows = []
            for _, row in pdf.iterrows():
                t = row["term"]
                p = TermPostings(row, 0.0)
                blocks = p.blocks_for_docs(s_ords)
                d, tf = p.decode_blocks(blocks)
                m = np.isin(d, s_ords)
                for ord_v, tf_v in zip(d[m], tf[m]):
                    i = int(np.searchsorted(s_ords, ord_v))
                    _, cid, tid = want[order[i]]
                    rows.append((cid, tid, t, int(tf_v)))
            return pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "term", "tf"]
            )

        tfdf = (
            self.postings()
            .filter(
                F.col("seg_id").isin(seg_ids) & F.col("term").isin(terms)
            )
            .groupBy("seg_id")
            .applyInPandas(run_seg, "conv_id string, turn_idx int, "
                                    "term string, tf long")
        )

        def _idf(t: str) -> float:
            return math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))

        meta = self.spark.createDataFrame(
            [(t, dfs[t], float(bm.get(t, 1.0)), _idf(t)) for t in terms],
            "term string, df long, boost double, idf double",
        )
        lens = self.spark.createDataFrame(
            [(r.conv_id, int(r.turn_idx), float(r.doc_len)) for r in loc],
            "conv_id string, turn_idx int, doc_len double",
        )
        norm = K1 * (1 - B + B * F.col("doc_len") / avgdl)
        out = (
            tfdf.join(F.broadcast(meta), "term")
            .join(F.broadcast(lens), ["conv_id", "turn_idx"])
            .withColumn(
                "contrib",
                F.col("boost") * F.col("idf")
                * (F.col("tf") * (K1 + 1)) / (F.col("tf") + norm),
            )
            .select(
                "conv_id", "turn_idx", "term", "tf", "df", "idf", "contrib"
            )
        )
        if round_to is not None:
            out = out.withColumn("idf", F.round("idf", round_to)).withColumn(
                "contrib", F.round("contrib", round_to)
            )
        return out.orderBy("conv_id", "turn_idx", "term")

    # -- significant terms ---------------------------------------------
    def significant_terms(
        self,
        spec: BooleanSpec,
        min_fg: int = 5,
        limit: int = 20,
    ) -> DataFrame:
        """significantTerms THROUGH the index (SignificantTermsQParserPlugin):
        terms over-represented in the query's hit set vs the corpus,
        scored fg_df²/bg_df (the battery op's pinned formula).

        Physical — zero shuffle until the tiny term aggregation: the
        seg-id driver fans out one task per segment; each task reads
        its OWN postings file, computes the segment's hit DocSet once
        (match_segment), then counts |postings(term) ∩ hits| per term
        with doc-level decodes only (no position bytes). Per-segment
        (term, fg, df) partials sum exactly (a doc lives in one
        segment). At real scale the candidate enumeration would be
        bounded by a field/prefix or df band exactly like Solr's term
        enum — the per-task loop is vocabulary-bounded, never
        corpus-bounded.

        ref: solr/core/src/java/org/apache/solr/search/
             SignificantTermsQParserPlugin.java"""
        import numpy as np

        from lucene_solr_spark.query.scorer import TermPostings, match_segment

        if spec.needs_rewrite:
            spec = self.rewrite(spec)
        seg_dirs = self.seg_dir_by_id
        dm_cols = filter_cols(spec, _BASE_COLS)
        deleted_bc = self._deleted_bc
        lspec = spec

        def run_seg(pdf):
            import pandas as pd
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            post = pq.read_table(
                f"{seg_dirs[seg_id]}/postings.parquet",
                columns=postings_task_columns(lspec),
            ).to_pandas()
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
            ).to_pandas()
            allowed = apply_deletes(
                filter_mask(dm, lspec), dm,
                deleted_bc.value if deleted_bc else None,
            )
            term_rows = {r["term"]: r for _, r in post.iterrows()}
            max_dl = int(dm["doc_len"].max()) if len(dm) else 0
            hits = match_segment(lspec, term_rows, len(dm), allowed, max_dl)
            if len(hits) == 0:
                return pd.DataFrame(columns=["term", "fg", "df"])
            out_t, out_f, out_d = [], [], []
            for t, row in term_rows.items():
                d = TermPostings(row, 0.0).decode_all()[0]
                fg = int(np.isin(d, hits, assume_unique=True).sum())
                if fg or row["df"]:
                    out_t.append(t)
                    out_f.append(fg)
                    out_d.append(int(row["df"]))
            return pd.DataFrame({"term": out_t, "fg": out_f, "df": out_d})

        partials = self.seg_driver().groupBy("seg_id").applyInPandas(
            run_seg, "term string, fg long, df long"
        )
        agg = partials.groupBy("term").agg(
            F.sum("fg").alias("fg_df"), F.sum("df").alias("bg_df")
        )
        return (
            agg.filter(F.col("fg_df") >= min_fg)
            .select(
                "term", "fg_df", "bg_df",
                F.round(
                    F.col("fg_df").cast("double")
                    * F.col("fg_df") / F.col("bg_df"),
                    4,
                ).alias("score"),
            )
            .orderBy(F.desc("score"), "term")
            .limit(limit)
        )

    # -- block join: conversation-level search -------------------------
    def search_conversations(
        self,
        spec: BooleanSpec,
        k: int = 10,
        score_mode: str = "max",
        round_to: int | None = None,
    ) -> DataFrame:
        """ToParentBlockJoinQuery over the conv↔turn block model
        (SURVEY §2.3 J4): rank conversations by their matching turns'
        BM25 scores aggregated with a Lucene ScoreMode (`max`/`total`/
        `avg`), plus the matching-turn count.

        Physical: the per-segment scorer emits ALL matching turns with
        scores via :meth:`score_hits` (UNSORTED — no global sort below
        the aggregation; conversations never span segments in the
        hash-partitioned build, so the parent aggregation needs no
        extra care), then one groupBy(conv_id) agg + TakeOrdered."""
        agg_fn = {"max": F.max, "total": F.sum, "avg": F.avg}[score_mode]
        turn_hits = self.score_hits(spec, k=None)
        out = (
            turn_hits.groupBy("conv_id")
            .agg(
                agg_fn("score").alias("score"),
                F.count("*").alias("n_turns"),
            )
        )
        if round_to is not None:
            out = out.withColumn("score", F.round("score", round_to))
        return out.orderBy(F.desc("score"), "conv_id").limit(k)

    # -- early-terminating sorted collection (W6) -----------------------
    def early_topk(
        self,
        k: int = 10,
        fields: tuple[str, ...] = ("role",),
        cursor: tuple[str, int] | None = None,
    ) -> DataFrame:
        """Early-terminating collection when the request sort MATCHES
        the index sort (conv_id, turn_idx): each segment task streams
        its docmap Parquet in batches and STOPS after k live rows —
        the Lucene ``EarlyTerminatingSortingCollector`` /
        index-time-sort contract (W6). Only n_segments × k candidate
        rows reach the final TakeOrdered merge; a segment never
        materializes more than ceil(k / batch) batches regardless of
        its size, which is what makes a sorted first-page query O(k)
        per segment at any corpus scale.

        ``cursor`` is the cursorMark over the INDEX sort: the
        (conv_id, turn_idx) of the previous page's last row. Each
        segment SKIPS whole Parquet row groups whose conv_id max
        statistic sits at or before the mark (the sorted-segment seek),
        then masks the boundary batch — page cost stays O(k) per
        segment at any depth, the CursorMark-over-ExportHandler
        contract.

        ref: lucene/core/src/java/org/apache/lucene/search/
             EarlyTerminatingSortingCollector.java (pre-8.x; folded
             into TopFieldCollector when the index sort matches),
             lucene/core/src/java/org/apache/lucene/index/IndexWriterConfig.java
             (setIndexSort); solr/core/src/java/org/apache/solr/search/
             CursorMark.java (keyset paging on the request sort)"""
        import pandas as pd

        seg_dirs = self.seg_dir_by_id
        deleted_bc = self._deleted_bc
        has_deletes = bool(self.deleted_keys)
        cols = ["conv_id", "turn_idx", *fields]
        schema = ", ".join(
            ["conv_id string", "turn_idx int"]
            + [f"{f} string" for f in fields]
        )
        kk = int(k)

        lcursor = cursor

        def run_seg(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            pf = pq.ParquetFile(f"{seg_dirs[seg_id]}/docmap.parquet")
            conv_i = pf.schema_arrow.names.index("conv_id")
            groups = range(pf.num_row_groups)
            if lcursor is not None:
                # sorted-segment seek: drop row groups that END at or
                # before the mark's conv (conservative — the boundary
                # group is re-masked row-wise below)
                groups = [
                    g for g in groups
                    if (st := pf.metadata.row_group(g).column(conv_i)
                        .statistics) is None or st.max >= lcursor[0]
                ]
            got: list[pd.DataFrame] = []
            n = 0
            # docmap is written in index-sort order, so streaming the
            # head IS the segment's sorted top-k; deletes are masked
            # batch-by-batch before counting toward k.
            for batch in pf.iter_batches(
                batch_size=max(kk, 1024), columns=cols,
                row_groups=list(groups),
            ):
                dm = batch.to_pandas()
                if lcursor is not None:
                    c0, t0 = lcursor
                    after = (dm["conv_id"] > c0) | (
                        (dm["conv_id"] == c0) & (dm["turn_idx"] > t0)
                    )
                    dm = dm[after]
                if has_deletes:
                    live = apply_deletes(
                        None, dm, deleted_bc.value if deleted_bc else None
                    )
                    if live is not None:
                        dm = dm[live]
                got.append(dm.head(kk - n))
                n += len(got[-1])
                if n >= kk:
                    break
            if not got:
                return pd.DataFrame(columns=cols)
            return pd.concat(got, ignore_index=True)[cols]

        cands = self.seg_driver().groupBy("seg_id").applyInPandas(
            run_seg, schema
        )
        return cands.orderBy("conv_id", "turn_idx").limit(kk)

    # -- segment-driver helper -----------------------------------------
    def seg_driver(self) -> DataFrame:
        """One row per committed segment — the MatchAllDocs-style plan
        driver: guarantees every segment runs, even ones containing
        none of a query's terms (pure-negative / filter-only specs,
        MatchAll facet domains)."""
        seg_ids = sorted(self.seg_dir_by_id)
        # one TASK per segment only up to the cluster's core count:
        # past that, tasks serve several segment GROUPS sequentially
        # (same per-segment UDF calls, fewer scheduling waves — at 192
        # segments on local[32] this is 6× less task overhead, and on
        # a 1000-executor cluster it still spreads one segment per
        # core)
        n_parts = min(
            len(seg_ids),
            max(self.spark.sparkContext.defaultParallelism, 1),
        )
        return self.spark.createDataFrame(
            [(s,) for s in seg_ids], "seg_id int"
        ).repartition(n_parts, "seg_id")

    # -- DocSet (all matches, no scoring) ------------------------------
    def docset(self, spec: BooleanSpec) -> DataFrame:
        """ALL matching (conv_id, turn_idx) — ``getDocSet`` analog,
        used by filter queries, exports, and MultiTermQuery rewrites.

        Specs WITHOUT positive terms (pure-negative ``-stream`` /
        filter-only ``role:assistant``) run over the segment-id driver
        so term-free segments still contribute (Solr wraps these as
        MatchAllDocs minus exclusions, ``QueryUtils#makeQueryable``);
        each task then reads its own segment's postings for the
        excluded terms straight from Parquet (term-pruned by row-group
        stats) — no corpus shuffle either way."""
        if spec.needs_rewrite:
            spec = self.rewrite(spec)
        if spec.min_should_match > len(spec.should):
            # unsatisfiable mm (e.g. empty multiterm rewrite): zero
            # docs — NOT MatchAll, and NOT the filter-only fallback
            return self.spark.createDataFrame(
                [], "conv_id string, turn_idx int"
            )
        ds_bc = self._docset_cached_bc(spec)
        if ds_bc is not None:
            # queryResultCache hit: serve keys straight off the
            # broadcast hit bitsets — no postings read, no fq
            # evaluation, docmap scan pruned to the two key columns
            # (liveDocs already baked into the cached bits)
            seg_dirs = self.seg_dir_by_id

            def from_bits(pdf):
                import numpy as np
                import pandas as pd
                import pyarrow.parquet as pq

                seg_id = int(pdf["seg_id"].iloc[0])
                bits, n = ds_bc.get(seg_id)
                hits = np.flatnonzero(np.unpackbits(
                    np.frombuffer(bits, np.uint8), count=n
                ))
                dm = pq.read_table(
                    f"{seg_dirs[seg_id]}/docmap.parquet",
                    columns=["conv_id", "turn_idx"],
                ).to_pandas()
                sel = dm.iloc[hits]
                return pd.DataFrame(
                    {"conv_id": sel["conv_id"], "turn_idx": sel["turn_idx"]}
                )

            return self.seg_driver().groupBy("seg_id").applyInPandas(
                from_bits, schema="conv_id string, turn_idx int"
            )
        seg_dirs = self.seg_dir_by_id
        dm_cols = filter_cols(spec, _BASE_COLS)
        pure_negative = not spec.scoring_terms
        lookup = list(spec.lookup_terms)
        deleted_bc = self._deleted_bc

        def run_seg(pdf):
            import pandas as pd
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
            ).to_pandas()
            allowed = apply_deletes(
                filter_mask(dm, spec), dm,
                deleted_bc.value if deleted_bc else None,
            )
            if pure_negative:
                term_rows = {}
                if lookup:  # filter-only specs never touch postings
                    post_tbl = pq.read_table(
                        f"{seg_dirs[seg_id]}/postings.parquet",
                        filters=[("term", "in", lookup)],
                        columns=postings_task_columns(spec),
                    ).to_pandas()
                    term_rows = {r["term"]: r for _, r in post_tbl.iterrows()}
            else:
                term_rows = {r["term"]: r for _, r in pdf.iterrows()}
            from lucene_solr_spark.query.scorer import match_segment

            hits = match_segment(
                spec, term_rows, len(dm), allowed,
                int(dm["doc_len"].max()) if len(dm) else 0,
            )
            sel = dm.iloc[hits]
            return pd.DataFrame(
                {"conv_id": sel["conv_id"], "turn_idx": sel["turn_idx"]}
            )

        if pure_negative:
            driver = self.seg_driver()
        else:
            driver = self.postings().filter(F.col("term").isin(lookup))
        return driver.groupBy("seg_id").applyInPandas(
            run_seg, schema="conv_id string, turn_idx int"
        )

    def payload_score(
        self,
        term: str,
        func: str = "sum",
        filters: tuple = (),
        k: int = 10,
        round_to: int | None = None,
    ) -> DataFrame:
        """``{!payload_score f=text func=... includeSpanScore=false}``
        analog: score each matching doc by a PayloadFunction (min / max
        / sum / average) over the payloads at the term's matched
        positions, replacing the span score entirely
        (includeSpanScore=false — the Lucene default).

        Payload encoding is a PINNED position rule, ``pay(p) = 1.0 +
        (p mod 4)`` — the DelimitedPayloadTokenFilter analog where the
        per-occurrence payload is derived at analysis time by a
        deterministic rule all three engines share (a stored-payload
        variant would add a payload stream to postings and bump
        ``format_version``; derivation keeps v2 readable). The decode
        path is the REAL one: per-segment position-stream varint decode
        (the same stream the phrase scorer reads), per-posting
        ``reduceat`` aggregation, deletes + filter mask applied before
        any payload math.

        ref: lucene/queries/src/java/org/apache/lucene/queries/payloads/
        PayloadScoreQuery.java, MaxPayloadFunction/MinPayloadFunction/
        SumPayloadFunction/AveragePayloadFunction.java
        """
        import numpy as np

        if func not in ("min", "max", "sum", "avg"):
            raise ValueError(f"unknown payload function: {func}")
        spec = BooleanSpec(must=(term,), filters=tuple(filters), k=k)
        seg_dirs = self.seg_dir_by_id
        dm_cols = filter_cols(spec, _BASE_COLS)
        deleted_bc = self._deleted_bc
        lfunc = func

        def run_seg(pdf):
            import pandas as pd
            import pyarrow.parquet as pq

            from lucene_solr_spark.query.scorer import TermPostings

            seg_id = int(pdf["seg_id"].iloc[0])
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
            ).to_pandas()
            allowed = apply_deletes(
                filter_mask(dm, spec), dm,
                deleted_bc.value if deleted_bc else None,
            )
            row = next(
                (r for _, r in pdf.iterrows() if r["term"] == term), None
            )
            empty = pd.DataFrame(columns=["conv_id", "turn_idx", "score"])
            if row is None:
                return empty
            tp = TermPostings(row, 0.0)
            d, tf, pos = tp.positions(np.arange(tp.n_blocks))
            if allowed is not None:
                keep = allowed[d]
                occ_keep = np.repeat(keep, tf)
                d, tf, pos = d[keep], tf[keep], pos[occ_keep]
            if len(d) == 0:
                return empty
            pay = 1.0 + (pos % 4).astype(np.float64)
            starts = np.cumsum(tf) - tf
            if lfunc == "sum":
                s = np.add.reduceat(pay, starts)
            elif lfunc == "max":
                s = np.maximum.reduceat(pay, starts)
            elif lfunc == "min":
                s = np.minimum.reduceat(pay, starts)
            else:  # avg
                s = np.add.reduceat(pay, starts) / tf.astype(np.float64)
            sel = dm.iloc[d]
            return pd.DataFrame(
                {
                    "conv_id": sel["conv_id"].to_numpy(),
                    "turn_idx": sel["turn_idx"].to_numpy(),
                    "score": s,
                }
            )

        post = self.postings().filter(F.col("term") == term)
        hits = post.groupBy("seg_id").applyInPandas(
            run_seg, schema=RESULT_SCHEMA
        )
        if round_to is not None:
            hits = hits.withColumn("score", F.round("score", round_to))
        return hits.orderBy(
            F.desc("score"), "conv_id", "turn_idx"
        ).limit(k)

    def termfreq(self, term: str) -> DataFrame:
        """``termfreq(field, term)`` relevance ValueSource: the per-doc
        RAW term frequency straight off the postings blocks — no idf,
        no length norm (the function-query building block under
        docfreq()/totaltermfreq()/idf(), whose values are dictionary
        stats — see :meth:`global_df` / the term dictionary's ``cf``).

        Term-pruned: only the one term's postings rows move; the
        decode is the same vectorized block decode the scorer uses.
        A docmap read site — the tombstone mask applies.

        ref: lucene/queries/src/java/org/apache/lucene/queries/function/
             valuesource/TermFreqValueSource.java (and
             DocFreqValueSource / TotalTermFreqValueSource for the
             constant-per-term stats); solr/core/src/java/org/apache/
             solr/search/ValueSourceParser.java (termfreq/docfreq/
             totaltermfreq registrations)
        """
        import numpy as np

        seg_dirs = self.seg_dir_by_id
        deleted_bc = self._deleted_bc

        def run_seg(pdf):
            import pandas as pd
            import pyarrow.parquet as pq

            from lucene_solr_spark.query.scorer import TermPostings

            seg_id = int(pdf["seg_id"].iloc[0])
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=_BASE_COLS
            ).to_pandas()
            allowed = apply_deletes(
                None, dm, deleted_bc.value if deleted_bc else None
            )
            row = next(
                (r for _, r in pdf.iterrows() if r["term"] == term), None
            )
            if row is None:
                return pd.DataFrame(columns=["conv_id", "turn_idx", "tf"])
            d, tf = TermPostings(row, 0.0).decode_all()
            if allowed is not None:
                keep = allowed[d]
                d, tf = d[keep], tf[keep]
            sel = dm.iloc[d]
            return pd.DataFrame(
                {
                    "conv_id": sel["conv_id"].to_numpy(),
                    "turn_idx": sel["turn_idx"].to_numpy(),
                    "tf": tf.astype(np.int64),
                }
            )

        post = self.postings().filter(F.col("term") == term)
        return post.groupBy("seg_id").applyInPandas(
            run_seg, schema="conv_id string, turn_idx int, tf long"
        )

    def payload_check(
        self,
        terms: tuple[str, ...],
        payloads: tuple[float, ...],
        k: int = 10,
        round_to: int | None = None,
    ) -> DataFrame:
        """``SpanPayloadCheckQuery`` analog: exact-adjacency phrase
        occurrences whose per-position payloads equal ``payloads``
        slot-for-slot, payloads from the pinned derivation rule
        ``pay(p) = 1.0 + (p mod 4)``. The check is POSITIONAL — it
        narrows which occurrences count, so the matched DocSet can be
        a strict subset of the plain phrase's (a doc whose only
        occurrence starts at the wrong residue drops out entirely).
        Score = the count of payload-valid occurrences (span freq;
        the spans themselves carry no BM25 weight here, mirroring the
        payload_score family replacing the span score). An
        unsatisfiable payload sequence (one that contradicts the
        derivation rule) matches nothing rather than erroring —
        Lucene's behavior for a payload no indexed span carries.

        Physical: per-segment position-stream decode (the phrase
        scorer's two-phase matcher), residue mask over the surviving
        start keys, deletes + docmap mask applied before counting —
        a docmap read site like every other.

        ref: lucene/queries/src/java/org/apache/lucene/queries/
        payloads/SpanPayloadCheckQuery.java
        """
        import numpy as np

        if len(payloads) != len(terms):
            raise ValueError(
                f"payloads/terms length mismatch: {len(payloads)} vs "
                f"{len(terms)}"
            )
        if any(p not in (1.0, 2.0, 3.0, 4.0) for p in payloads):
            raise ValueError(f"payloads outside pay(p) range: {payloads}")
        spec = BooleanSpec(phrases=(tuple(terms),), k=k)
        seg_dirs = self.seg_dir_by_id
        dm_cols = filter_cols(spec, _BASE_COLS)
        deleted_bc = self._deleted_bc
        max_dl = {
            sid: self.manifest.seg_max_dl(sid) for sid in seg_dirs
        }
        if any(v is None for v in max_dl.values()):
            max_dl = {
                int(r["seg_id"]): int(r["mdl"])
                for r in self.docmap()
                .groupBy("seg_id")
                .agg(F.max("doc_len").alias("mdl"))
                .collect()
            }
        terms_t, pays = tuple(terms), tuple(payloads)

        def run_seg(pdf):
            import pandas as pd
            import pyarrow.parquet as pq

            from lucene_solr_spark.query.scorer import (
                TermPostings,
                _phrase_start_keys,
            )

            empty = pd.DataFrame(columns=["conv_id", "turn_idx", "score"])
            seg_id = int(pdf["seg_id"].iloc[0])
            term_rows = {r["term"]: r for _, r in pdf.iterrows()}
            tps = [
                TermPostings(term_rows[t], 0.0) if t in term_rows else None
                for t in terms_t
            ]
            seg_max = int(max_dl[seg_id])
            keys = _phrase_start_keys(tps, seg_max)
            if len(keys) == 0:
                return empty
            stride = seg_max + 2
            p = keys % stride
            m = np.ones(len(keys), bool)
            for i, pv in enumerate(pays):
                m &= (1.0 + ((p + i) % 4).astype(np.float64)) == pv
            docs = keys[m] // stride
            if len(docs) == 0:
                return empty
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
            ).to_pandas()
            allowed = apply_deletes(
                filter_mask(dm, spec), dm,
                deleted_bc.value if deleted_bc else None,
            )
            if allowed is not None:
                docs = docs[allowed[docs]]
                if len(docs) == 0:
                    return empty
            d, c = np.unique(docs, return_counts=True)
            sel = dm.iloc[d]
            return pd.DataFrame(
                {
                    "conv_id": sel["conv_id"].to_numpy(),
                    "turn_idx": sel["turn_idx"].to_numpy(),
                    "score": c.astype(np.float64),
                }
            )

        post = self.postings().filter(F.col("term").isin(list(terms_t)))
        hits = post.groupBy("seg_id").applyInPandas(
            run_seg, schema=RESULT_SCHEMA
        )
        if round_to is not None:
            hits = hits.withColumn("score", F.round("score", round_to))
        return hits.orderBy(
            F.desc("score"), "conv_id", "turn_idx"
        ).limit(k)

    # -- MultiTermQuery rewrite (dictionary scan → OR expansion) -------
    def expand_terms(self, predicate, max_expansions: int = 1024) -> list[str]:
        """Dictionary scan: terms of the text field matching a Column
        predicate over ``term`` (PrefixQuery/WildcardQuery/FuzzyQuery
        rewrite, ``MultiTermQuery#RewriteMethod``).

        Bounded like Lucene's TopTermsRewrite: when the automaton
        matches more than ``max_expansions`` terms (think ``.*``-ish
        wildcards over a 100M-term dictionary), only the highest-df
        terms survive, (df desc, term asc) — never an unbounded
        driver collect."""
        rows = (
            self.postings()
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .filter(predicate)
            .orderBy(F.desc("df"), "term")
            .limit(max_expansions)
            .collect()
        )
        return sorted(r.term for r in rows)

    @staticmethod
    def wildcard_predicate(pattern: str):
        """Lucene wildcard pattern → Column predicate over ``term``
        (``*`` any sequence, ``?`` one char, ``\\`` escapes), compiled
        to SQL LIKE so the dictionary scan stays JVM-side with the
        leading-literal prefix still pushable to the Parquet reader.

        ref: lucene/core/src/java/org/apache/lucene/search/WildcardQuery.java
        """
        out: list[str] = []
        i, n = 0, len(pattern)
        while i < n:
            c = pattern[i]
            if c == "\\" and i + 1 < n:  # escaped wildcard char
                i += 1
                c = pattern[i]
                out.append("\\" + c if c in "%_\\" else c)
            elif c == "*":
                out.append("%")
            elif c == "?":
                out.append("_")
            elif c in "%_\\":  # literal LIKE metachar
                out.append("\\" + c)
            else:
                out.append(c)
            i += 1
        return F.col("term").like("".join(out))

    @staticmethod
    def regexp_predicate(pattern: str):
        """Lucene RegexpQuery semantics: the pattern must match the
        WHOLE term (the automaton is anchored), so wrap with ^(?:...)$
        before handing to Java regex.

        ref: lucene/core/src/java/org/apache/lucene/search/RegexpQuery.java,
             lucene/core/src/java/org/apache/lucene/util/automaton/RegExp.java
        """
        return F.col("term").rlike(f"^(?:{pattern})$")

    @staticmethod
    def fuzzy_predicate(text: str, max_edits: int = 2):
        """FuzzyQuery rewrite predicate: the LevenshteinAutomata-∩-FST
        dictionary walk re-expressed as a BANDED dictionary filter. A
        cheap length-band prune short-circuits ahead of the edit
        distance — |len(term) − len(q)| is a lower bound on it, so the
        band never drops a true match — and the distance itself uses
        Spark's thresholded 3-arg ``levenshtein`` (banded DP, returns
        −1 past the threshold; never the full O(n·m) matrix). At a
        billion-term dictionary the band factor is what keeps the
        fuzzy front door from a full-dict edit-distance scan
        (VERDICT r4 item 5).

        ref: lucene/core/src/java/org/apache/lucene/search/FuzzyQuery.java,
             lucene/core/src/java/org/apache/lucene/util/automaton/
             LevenshteinAutomata.java"""
        band = F.abs(F.length("term") - F.lit(len(text))) <= F.lit(max_edits)
        return band & (
            F.levenshtein(F.col("term"), F.lit(text), max_edits) >= 0
        )

    def expand_wildcard(self, pattern: str, max_expansions: int = 1024):
        """WildcardQuery rewrite: dictionary scan → bounded term set."""
        return self.expand_terms(
            self.wildcard_predicate(pattern), max_expansions
        )

    def expand_regexp(self, pattern: str, max_expansions: int = 1024):
        """RegexpQuery rewrite: dictionary scan → bounded term set."""
        return self.expand_terms(
            self.regexp_predicate(pattern), max_expansions
        )

    def rewrite(self, spec: BooleanSpec, max_expansions: int = 1024) -> BooleanSpec:
        """MultiTermQuery rewrite phase (``IndexSearcher#rewrite``):
        expand the parser's wildcard/regexp nodes against the term
        dictionary into SHOULD TermQuery clauses (scoring boolean
        rewrite; each expanded term scores with its own idf). The
        search/docset/facet entry points call this automatically, so
        ``search(parse("data s?a*"))`` just works; a pattern matching
        nothing contributes no clauses (Lucene: empty rewrite)."""
        if not spec.needs_rewrite:
            return spec
        from dataclasses import replace

        extra: list[str] = []
        for pat in spec.wildcards:
            extra.extend(self.expand_wildcard(pat, max_expansions))
        for pat in spec.regexps:
            extra.extend(self.expand_regexp(pat, max_expansions))
        seen = set(spec.should)
        extra = tuple(t for t in dict.fromkeys(extra) if t not in seen)
        return replace(
            spec, wildcards=(), regexps=(), should=spec.should + extra
        )

    # -- faceting ------------------------------------------------------
    def facet(
        self,
        field: str,
        spec: BooleanSpec | None = None,
        limit: int = 10,
        mincount: int = 1,
        refine: bool = True,
        sort: str = "count",
        prefix: str | None = None,
        contains: str | None = None,
        contains_ignore_case: bool = False,
        matches: str | None = None,
        exclude_terms: tuple[str, ...] = (),
        missing: bool = False,
        exclude_fields: tuple[str, ...] = (),
        group_by: str | None = None,
        method: str = "auto",
        offset: int = 0,
    ) -> DataFrame:
        """SOLR-5894-style facet counts over the query domain
        (two-phase merge-and-refine; see query/facets.py). sort /
        prefix / missing mirror facet.sort / facet.prefix /
        facet.missing.

        ``exclude_fields`` is the multi-select faceting analog of
        Solr's ``fq={!tag=t}f:v`` + ``facet.field={!ex=t}f``
        (ref: solr/core/src/java/org/apache/solr/request/SimpleFacets.java
        computeDocSet / QueryParsing `ex` local param): every fq-side
        constraint on a listed field (`filters`, `not_filters`,
        `range_filters`) is dropped from THIS facet's domain, while
        the hit list and every other facet keep honoring it. Tags are
        request-plumbing in Solr; field names are the natural handle
        in this API.

        ``group_by="conv_id"`` is group.facet=true (each conversation
        counts once per bucket — see FacetRequest.group_by for why
        only the segment-local block key is allowed)."""
        from lucene_solr_spark.query.facets import FacetRequest, facet_field

        if spec is not None and spec.needs_rewrite:
            spec = self.rewrite(spec)
        if spec is not None and exclude_fields:
            spec = _exclude_filter_fields(spec, exclude_fields)

        return facet_field(
            self,
            FacetRequest(
                field=field, limit=limit, mincount=mincount,
                sort=sort, prefix=prefix, contains=contains,
                contains_ignore_case=contains_ignore_case,
                matches=matches,
                exclude_terms=tuple(exclude_terms),
                missing=missing, group_by=group_by, offset=offset,
            ),
            spec=spec, refine=refine, method=method,
        )
