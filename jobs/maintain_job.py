#!/usr/bin/env python
"""spark-submit entry point for index maintenance — the ops-plane
counterpart of build_job.py (DirectUpdateHandler2 / ReplicationHandler
admin surface).

Usage (after `python jobs/package.py`):

    spark-submit --py-files dist/lucene_solr_spark.zip jobs/maintain_job.py \\
        merge     --index /path/idx [--merge-factor 8]
    ... split     --index /path/idx --segment part_00000 [--children 2]
    ... delete    --index /path/idx --query 'role:assistant AND merge'
    ... replicate --src /leader/idx --dst /follower/idx
    ... clear-tombstones --index /path/idx
    ... gc-snapshots --index /path/idx --keep 2

`delete` parses the query with the engine's parser (same syntax as
/select q=), resolves the DocSet through the index, and commits the
tombstone snapshot. Each subcommand prints one JSON status line.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("merge")
    p.add_argument("--index", required=True)
    p.add_argument("--merge-factor", type=int, default=8)

    p = sub.add_parser("split")
    p.add_argument("--index", required=True)
    p.add_argument("--segment", required=True)
    p.add_argument("--children", type=int, default=2)

    p = sub.add_parser("delete")
    p.add_argument("--index", required=True)
    p.add_argument("--query", required=True)

    p = sub.add_parser("replicate")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--no-clean", action="store_true")

    p = sub.add_parser("clear-tombstones")
    p.add_argument("--index", required=True)

    p = sub.add_parser("gc-snapshots")
    p.add_argument("--index", required=True)
    p.add_argument("--keep", type=int, default=1)

    p = sub.add_parser("backup")
    p.add_argument("--index", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("restore")
    p.add_argument("--backup", required=True)
    p.add_argument("--index", required=True)

    p = sub.add_parser("check")
    p.add_argument("--index", required=True)
    p.add_argument("--deep", action="store_true")
    p.add_argument("--snapshot", type=int, default=None)

    # /update loader verbs from spark-submit (JsonLoader/XMLLoader/
    # CSVLoader formats onto the same validated command path)
    for verb in ("update-json", "update-xml", "update-csv"):
        p = sub.add_parser(verb)
        p.add_argument("--index", required=True)
        p.add_argument("--body", help="inline command payload")
        p.add_argument("--body-file", help="path to a payload file")
        p.add_argument("--batch-tag", type=int, default=1)
        if verb == "update-csv":
            p.add_argument("--commit", action="store_true")

    args = ap.parse_args(argv)

    if args.cmd == "replicate":  # file-level; no Spark session needed
        from lucene_solr_spark.index.replication import replicate

        st = replicate(args.src, args.dst, clean=not args.no_clean)
        print(json.dumps({"cmd": "replicate", **st}))
        return st

    if args.cmd == "backup":
        from lucene_solr_spark.index.replication import backup

        st = backup(args.index, args.out)
        print(json.dumps({"cmd": "backup", **st}))
        return st

    if args.cmd == "restore":
        from lucene_solr_spark.index.replication import restore

        st = restore(args.backup, args.index)
        print(json.dumps({"cmd": "restore", **st}))
        return st

    if args.cmd == "gc-snapshots":
        from lucene_solr_spark.index.manifest import gc_snapshots

        st = gc_snapshots(args.index, keep_last=args.keep)
        print(json.dumps({"cmd": "gc-snapshots", **st}))
        return st

    if args.cmd == "clear-tombstones":
        from lucene_solr_spark.index.deletes import clear_tombstones

        clear_tombstones(args.index)
        st = {"cmd": "clear-tombstones", "index": args.index, "ok": True}
        print(json.dumps(st))
        return st

    # reuse an already-active session (in-process tests); only stop a
    # session this job itself created
    active = SparkSession.getActiveSession()
    spark = active or SparkSession.builder.appName(f"lss-{args.cmd}").getOrCreate()
    try:
        if args.cmd == "check":
            # CheckIndex (tools/check_index.py) as a maintenance verb
            from tools.check_index import check_index

            st = {"cmd": "check", **check_index(
                spark, args.index, deep=args.deep,
                snapshot_id=args.snapshot)}
        elif args.cmd in ("update-json", "update-xml", "update-csv"):
            from lucene_solr_spark.handler import (
                update_csv,
                update_json,
                update_xml,
            )

            if bool(args.body) == bool(args.body_file):
                raise SystemExit(
                    f"{args.cmd} wants exactly one of --body/--body-file")
            raw = args.body if args.body else open(args.body_file).read()
            if args.cmd == "update-json":
                res = update_json(spark, args.index, json.loads(raw),
                                  batch_tag=args.batch_tag)
            elif args.cmd == "update-xml":
                res = update_xml(spark, args.index, raw,
                                 batch_tag=args.batch_tag)
            else:
                res = update_csv(spark, args.index, raw,
                                 commit=args.commit,
                                 batch_tag=args.batch_tag)
            st = {"cmd": args.cmd, **res}
        elif args.cmd == "merge":
            from lucene_solr_spark.index.merge import merge_segments

            m = merge_segments(spark, args.index, merge_factor=args.merge_factor)
            st = {
                "cmd": "merge",
                "snapshot_id": m.snapshot_id,
                "n_segments": len(m.segments),
            }
        elif args.cmd == "split":
            from lucene_solr_spark.index.split import split_segment

            m = split_segment(
                spark, args.index, args.segment, n_children=args.children
            )
            st = {
                "cmd": "split",
                "snapshot_id": m.snapshot_id,
                "n_segments": len(m.segments),
            }
        else:  # delete
            from lucene_solr_spark.index.deletes import delete_by_query
            from lucene_solr_spark.query.parser import parse

            spec = parse(args.query)
            n = delete_by_query(spark, args.index, spec)
            st = {"cmd": "delete", "tombstones_total": n}
        print(json.dumps(st))
        return st
    finally:
        if active is None:
            spark.stop()


if __name__ == "__main__":
    main()
