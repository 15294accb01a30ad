"""CLI — mirrors the reference's subcommand surface (src/main.rs:16-118:
init / sync / check per chain; plus our gen / compact / bench helpers).

    python -m web3research_etl_ray gen     --out DIR --n-events N [--seed S]
    python -m web3research_etl_ray init    --stream DIR --lake DIR [--from-seq A --to-seq B]
    python -m web3research_etl_ray sync    --stream DIR --lake DIR [--ticks K --check-every E --dedup-index DIR --wire wal|debezium --wire-src DIR --watch]
    python -m web3research_etl_ray check   --stream DIR --lake DIR [--repair]
    python -m web3research_etl_ray compact --lake DIR [--keep K]
    python -m web3research_etl_ray backup  --lake DIR --out DIR
    python -m web3research_etl_ray restore --backup DIR --lake DIR
    python -m web3research_etl_ray dedup-tick --docs PARQUET --index DIR [--out F --compact]
    python -m web3research_etl_ray ann-tick  --vectors PARQUET --index DIR [--centroids K]
    python -m web3research_etl_ray ann-query --queries PARQUET --index DIR [--k N --n-probe P --out F]
    python -m web3research_etl_ray land    --format debezium|wal --src DIR --out DIR [--offsets F]

This entry point owns the Ray session (guarded init; library code never
calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session():
    """Init Ray iff nobody else owns the session (returns ray, owns)."""
    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray, owns


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="web3research_etl_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate a deterministic event stream")
    g.add_argument("--out", required=True)
    g.add_argument("--n-events", type=int, default=10_000)
    g.add_argument("--seed", type=int, default=42)

    for name in ("init", "sync", "check"):
        s = sub.add_parser(name)
        s.add_argument("--stream", required=True)
        s.add_argument("--lake", required=True)
        s.add_argument(
            "--partitions",
            type=lambda v: v if v == "auto" else int(v),
            default=32,
            help="partition count, or 'auto' (sized from input bytes "
                 "on the first generation)",
        )
        if name == "init":
            s.add_argument("--to-seq", type=int, default=None)
        if name == "sync":
            s.add_argument("--ticks", type=int, default=1)
            s.add_argument("--check-every", type=int, default=0)
            s.add_argument("--dedup-index", default=None,
                           help="enable inline near-dup detection against "
                                "this persistent index dir")
            s.add_argument("--dedup-threshold", type=float, default=0.5)
            s.add_argument("--wire", choices=("debezium", "wal"), default=None,
                           help="tail an external wire dump: land new "
                                "bytes into --stream before each tick")
            s.add_argument("--wire-src", default=None,
                           help="wire dump dir (required with --wire)")
            s.add_argument("--export-out", default=None,
                           help="publish each tick downstream as Debezium "
                                "JSONL into this wire dir (continuous "
                                "outbox; first tick = snapshot)")
            s.add_argument("--watch", action="store_true",
                           help="push mode: block on landing-zone "
                                "changes (20 ms stat poll; the wire is "
                                "drained inside the wait) instead of "
                                "ticking immediately")
            s.add_argument("--watch-timeout", type=float, default=None,
                           help="give up after this many idle seconds "
                                "in --watch mode (default: wait "
                                "indefinitely)")
        if name == "check":
            s.add_argument("--repair", action="store_true")

    c = sub.add_parser("compact", help="GC old generations (OPTIMIZE analogue)")
    c.add_argument("--lake", required=True)
    c.add_argument("--keep", type=int, default=2)

    tg = sub.add_parser(
        "tag",
        help="pin / list / unpin named snapshots (Iceberg-tag analogue): "
             "tagged generations survive compact and stay readable via "
             "scan --tag",
    )
    tg.add_argument("--lake", required=True)
    tg.add_argument("--name", default=None,
                    help="tag to create (default: list existing tags)")
    tg.add_argument("--gen", type=int, default=None,
                    help="generation to pin (default: LATEST)")
    tg.add_argument("--delete", action="store_true",
                    help="unpin --name instead of creating it")
    tg.add_argument("--replace", action="store_true",
                    help="move --name if it already pins another generation")

    sp = sub.add_parser(
        "split",
        help="double the file count of the given (or all oversized) base "
             "partitions — rewrites ONLY those partitions' bytes",
    )
    sp.add_argument("--lake", required=True)
    sp.add_argument("--bases", default=None,
                    help="comma-separated base pids (default: every base "
                         "with a file over --threshold rows)")
    sp.add_argument("--threshold", type=int, default=4_000_000)

    pg = sub.add_parser(
        "purge",
        help="GDPR erase: tombstone + rewrite the live partitions for the "
             "given keys (watermarked — later re-upserts still apply); "
             "compose with 'compact' to drop historical bytes",
    )
    pg.add_argument("--lake", required=True)
    pg.add_argument("--keys", default=None,
                    help="parquet file with the key columns (default spec: "
                         "repo, path)")
    pg.add_argument("--key", action="append", default=[],
                    help="inline key as 'repo<TAB-or-comma>path'; repeatable")

    b = sub.add_parser("backup", help="snapshot the committed generation "
                                      "(scripts/backup_db.py analogue)")
    b.add_argument("--lake", required=True)
    b.add_argument("--out", required=True)

    r = sub.add_parser("restore", help="restore a backup snapshot")
    r.add_argument("--backup", required=True)
    r.add_argument("--lake", required=True)

    dd = sub.add_parser(
        "dedup-tick",
        help="incremental near-dup tick: signature new docs, probe the "
             "persistent MinHash band index, emit pairs, join the index",
    )
    dd.add_argument("--docs", required=True,
                    help="parquet file/dir with (doc_id, text)")
    dd.add_argument("--index", required=True, help="index root dir")
    dd.add_argument("--threshold", type=float, default=0.5)
    dd.add_argument("--out", default=None,
                    help="write pairs parquet here (else print count only)")
    dd.add_argument("--compact", action="store_true",
                    help="merge each bucket's tick files after the tick")

    at = sub.add_parser(
        "ann-tick",
        help="incremental ANN tick: assign new embedding vectors to the "
             "persistent IVF index's cells (first tick trains the frozen "
             "coarse quantizer)",
    )
    at.add_argument("--vectors", required=True,
                    help="parquet file/dir with (vec_id, embedding)")
    at.add_argument("--index", required=True, help="index root dir")
    at.add_argument("--centroids", type=int, default=None,
                    help="coarse-quantizer size for a NEW index (an "
                         "existing index reopens with its own config)")

    aq = sub.add_parser(
        "ann-query",
        help="top-k cosine search against the IVF index: query vectors "
             "come from a parquet file; only probed cell dirs are read",
    )
    aq.add_argument("--queries", required=True,
                    help="parquet file with (vec_id, embedding) query rows")
    aq.add_argument("--index", required=True, help="index root dir")
    aq.add_argument("--k", type=int, default=10)
    aq.add_argument("--n-probe", type=int, default=4)
    aq.add_argument("--out", default=None,
                    help="write result parquet here (else print count only)")

    ld = sub.add_parser(
        "land",
        help="land an external CDC wire dump (Debezium JSONL or binary "
             "WAL segments) into the canonical stream layout",
    )
    ld.add_argument("--format", choices=("debezium", "wal"), required=True)
    ld.add_argument("--src", required=True, help="wire dump dir")
    ld.add_argument("--out", required=True, help="canonical stream dir")
    ld.add_argument("--offsets", default=None,
                    help="(wal) JSON file holding per-segment byte offsets; "
                         "read before landing, rewritten after — makes "
                         "repeated `land` calls a binlog tail")

    cu = sub.add_parser(
        "curate",
        help="training-data curation: fused PII/quality/lang scan + "
             "filter + exact dedup, hive-partitioned Parquet output",
    )
    cu.add_argument("--docs", required=True,
                    help="parquet file/dir with (doc_id, text)")
    cu.add_argument("--out", required=True, help="output dir (partitioned "
                    "by predicted language)")
    cu.add_argument("--quality-min", type=float, default=0.75)
    cu.add_argument("--force", action="store_true",
                    help="overwrite a non-empty output dir")

    ct = sub.add_parser(
        "curate-tick",
        help="incremental curation tick: filter + dedup the NEW docs "
             "against the persistent sha index (O(tick), not O(corpus))",
    )
    ct.add_argument("--docs", required=True,
                    help="parquet file/dir with the tick's (doc_id, text)")
    ct.add_argument("--index", required=True, help="curation index root")
    ct.add_argument("--quality-min", type=float, default=0.75)
    ct.add_argument("--out", default=None,
                    help="write the tick's curated rows here (parquet)")

    lk = sub.add_parser("lookup", help="point lookup by upsert key "
                        "(partition-pruned, O(1) files)")
    lk.add_argument("--lake", required=True)
    lk.add_argument("--repo", required=True)
    lk.add_argument("--path", required=True)

    sc = sub.add_parser("scan", help="predicate-pruned lake scan "
                        "(Parquet footer zone maps)")
    sc.add_argument("--lake", required=True)
    sc.add_argument("--where", required=True,
                    help="'col OP value' with OP in < <= == >= > "
                         "(value int or string)")
    sc.add_argument("--columns", default=None,
                    help="comma-separated projection")
    sc.add_argument("--out", default=None,
                    help="write matching rows here (parquet); else "
                         "print the row count")
    sc.add_argument("--table", default=None,
                    help="scan this table of a multi-table fan-out lake "
                         "instead of a single-table lake")
    sc.add_argument("--tag", default=None,
                    help="scan the snapshot pinned by this tag instead of "
                         "LATEST (single-table lakes)")

    ex = sub.add_parser(
        "export",
        help="publish the lake's change feed as Debezium JSONL "
             "(snapshot + changelog — bootstraps a replica lake)",
    )
    ex.add_argument("--lake", required=True)
    ex.add_argument("--out", required=True, help="wire output dir (JSONL)")
    ex.add_argument("--tick", action="store_true",
                    help="continuous-outbox mode: export everything "
                         "committed since the last export tick (cursor "
                         "kept in the wire dir; first tick = snapshot)")
    ex.add_argument("--from-gen", type=int, default=None, dest="from_gen")
    ex.add_argument("--to-gen", type=int, default=None, dest="to_gen",
                    help="default: latest committed generation")
    ex.add_argument("--snapshot", action="store_true",
                    help="also emit the from-gen state as op 'r' envelopes")

    df = sub.add_parser(
        "diff",
        help="cross-lake consistency check (source vs replica/backup): "
             "rows whose winner differs, partition-aligned, no shuffle",
    )
    df.add_argument("--lake", required=True, help="lake A (old side)")
    df.add_argument("--lake-b", required=True, dest="lake_b",
                    help="lake B (new side)")
    df.add_argument("--out", default=None,
                    help="write differing rows here (parquet); else "
                         "print the count")

    st = sub.add_parser("stats", help="lake lineage/watermark summary")
    st.add_argument("--lake", required=True)
    st.add_argument("--partitions", action="store_true",
                    help="include per-partition entries")

    qr = sub.add_parser(
        "query",
        help="run any registered pipeline by name over a table dir "
             "(the queries() registry); print rows or write parquet",
    )
    qr.add_argument("name", nargs="?", help="registry name; omit with "
                    "--list to enumerate")
    qr.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="directory holding the input parquet tables")
    qr.add_argument("--out", default=None,
                    help="write the full result as parquet (a directory "
                         "for Dataset results — resumable partitioned "
                         "files — or one file for driver-side tables)")
    qr.add_argument("--limit", type=int, default=20,
                    help="rows to print when --out is not given")
    qr.add_argument("--list", action="store_true",
                    help="list registered query names (o = exact oracle)")

    # multi-table fan-out verbs: the table set comes from a user module
    # ("pkg.mod:fn" returning list[FanoutTable]) — the CLI analogue of
    # the reference's per-chain module registry (src/main.rs:104-112)
    for name in ("init-fanout", "sync-fanout", "check-fanout"):
        f = sub.add_parser(
            name,
            help=f"{name.split('-')[0]} a multi-table fan-out lake "
                 "(one stream → N tables, one atomic generation)",
        )
        f.add_argument("--stream", required=True)
        f.add_argument("--lake", required=True)
        f.add_argument("--tables", required=True,
                       help="'module.path:callable' returning the "
                            "list[FanoutTable]")
        f.add_argument(
            "--partitions",
            type=lambda v: v if v == "auto" else int(v),
            default=16,
            help="partition count, or 'auto' (input-sized on gen 0, "
                 "committed count on resume)",
        )
        if name == "init-fanout":
            f.add_argument("--to-seq", type=int, default=None)
        if name == "sync-fanout":
            f.add_argument("--ticks", type=int, default=1)
            f.add_argument("--check-every", type=int, default=0)
            f.add_argument("--export-out", default=None,
                           help="publish each tick as per-table Debezium "
                                "JSONL feeds (one cross-table cursor)")
            f.add_argument("--watch", action="store_true",
                           help="push mode: block on landing-zone "
                                "changes instead of ticking immediately")
            f.add_argument("--watch-timeout", type=float, default=None)
        if name == "check-fanout":
            f.add_argument("--repair", action="store_true")

    args = p.parse_args(argv)

    if args.cmd == "gen":
        from .gen import generate_events

        info = generate_events(args.out, n_events=args.n_events, seed=args.seed)
        print(json.dumps({k: v for k, v in info.items() if k != "files"}))
        return 0

    if args.cmd == "compact":
        from .state.manifest import gc_generations

        removed = gc_generations(args.lake, keep=args.keep)
        print(json.dumps({"removed_generations": removed}))
        return 0

    if args.cmd == "tag":
        from .state.manifest import create_tag, delete_tag, list_tags

        if args.name is None:
            print(json.dumps({"tags": list_tags(args.lake)}))
        elif args.delete:
            try:
                gen = delete_tag(args.lake, args.name)
            except KeyError:
                print(
                    json.dumps(
                        {
                            "error": f"no tag {args.name!r}",
                            "tags": sorted(list_tags(args.lake)),
                        }
                    )
                )
                return 1
            print(json.dumps({"deleted": args.name, "generation": gen}))
        else:
            gen = create_tag(
                args.lake, args.name, args.gen, replace=args.replace
            )
            print(json.dumps({"tag": args.name, "generation": gen}))
        return 0

    if args.cmd == "backup":
        from .state.manifest import backup_lake

        print(json.dumps(backup_lake(args.lake, args.out)))
        return 0

    if args.cmd == "restore":
        from .state.manifest import restore_lake

        print(json.dumps(restore_lake(args.backup, args.lake)))
        return 0

    if args.cmd == "diff":
        from .pipelines.replay import lakes_diff

        ds = lakes_diff(args.lake, args.lake_b)
        if args.out:
            ds.write_parquet(args.out)
            print(json.dumps({"out": args.out}))
        else:
            print(json.dumps({"differing_keys": ds.count()}))
        return 0

    if args.cmd == "export":
        from .sources.debezium import export_debezium_jsonl, export_tick

        if args.tick:
            stats = export_tick(args.lake, args.out)
        elif args.from_gen is None:
            p.error("export needs --tick or --from-gen")
        else:
            stats = export_debezium_jsonl(
                args.lake, args.out, gen_old=args.from_gen,
                gen_new=args.to_gen, snapshot=args.snapshot,
            )
        print(json.dumps(stats))
        return 0

    if args.cmd == "lookup":
        from .pipelines.replay import lookup_key

        row = lookup_key(args.lake, args.repo, args.path)
        if row is not None:
            row = {k: (v.hex() if isinstance(v, bytes) else v)
                   for k, v in row.items()}
        print(json.dumps({"found": row is not None, "row": row}))
        return 0

    if args.cmd == "scan":
        import pyarrow.parquet as _pq

        from .pipelines.replay import lake_scan

        parts = args.where.split(None, 2)
        if len(parts) != 3:
            p.error("--where must be 'col OP value'")
        col, op, raw = parts
        try:
            val = int(raw)
        except ValueError:
            val = raw
        cols = args.columns.split(",") if args.columns else None
        if args.table:
            if args.tag:
                p.error("--tag applies to single-table lakes")
            from .pipelines.fanout import fanout_scan

            ds, read, total = fanout_scan(
                args.lake, args.table, predicate=(col, op, val),
                columns=cols,
            )
        else:
            gen = None
            if args.tag:
                from .state.manifest import resolve_tag

                gen = resolve_tag(args.lake, args.tag)
            ds, read, total = lake_scan(
                args.lake, predicate=(col, op, val), columns=cols,
                generation=gen,
            )
        if args.out:
            import pyarrow as _pa

            _pq.write_table(_pa.Table.from_pylist(ds.take_all()), args.out)
            n = _pq.read_metadata(args.out).num_rows
        else:
            n = ds.count()
        print(json.dumps({"rows": n, "files_read": read,
                          "files_total": total, "out": args.out}))
        return 0

    if args.cmd == "curate":
        from .pipelines.curate import curate_to_dir

        print(json.dumps(
            curate_to_dir(args.docs, args.out,
                          quality_min=args.quality_min,
                          overwrite=args.force)
        ))
        return 0

    if args.cmd == "curate-tick":
        import os

        import pyarrow.parquet as _pq

        import ray.data as _rd

        from .pipelines.curate import CurateIndex

        path = args.docs if args.docs.endswith(".parquet") else os.path.join(
            args.docs, "documents.parquet"
        )
        idx = CurateIndex(args.index, quality_min=args.quality_min)
        out = idx.tick(_rd.read_parquet(path, columns=["doc_id", "text"]))
        if args.out:
            _pq.write_table(out, args.out)
        print(json.dumps({"docs_kept": out.num_rows,
                          "out": args.out or None}))
        return 0

    if args.cmd == "stats":
        from dataclasses import asdict

        from .state.manifest import load_latest

        m = load_latest(args.lake)
        if m is None:
            print(json.dumps({"error": "no committed manifest"}))
            return 1
        doc = {
            "generation": m.generation,
            "num_partitions": m.num_partitions,
            "min_watermark": m.min_watermark,
            "max_watermark": m.max_watermark,
            "schema_version": m.schema_version,
            "applied_rollbacks": m.applied_rollbacks,
            "split_depths": {str(k): v for k, v in sorted(m.split_depths.items())},
            "num_files": sum(1 for e in m.partitions.values() if e.file),
            **m.totals(),
        }
        if args.partitions:
            doc["partitions"] = {
                str(k): asdict(v) for k, v in sorted(m.partitions.items())
            }
        print(json.dumps(doc))
        return 0

    if args.cmd == "query" and (args.list or not args.name):
        from .pipelines.queries import ORACLE_SQL, QUERIES

        print(json.dumps(
            {n: ("o" if n in ORACLE_SQL else "rows-only")
             for n in sorted(QUERIES)}
        ))
        return 0

    ray, owns_session = _ray_session()
    try:
        if args.cmd == "query":
            import pyarrow as pa
            import pyarrow.parquet as pq
            import ray.data as rd

            from .pipelines.queries import QUERIES

            if args.name not in QUERIES:
                p.error(f"unknown query {args.name!r} (see query --list)")
            res = QUERIES[args.name](args.sf_dir)
            if args.out:
                if isinstance(res, rd.Dataset):
                    res.write_parquet(args.out)
                    print(json.dumps({"out": args.out, "format": "dir"}))
                else:
                    pq.write_table(res, args.out)
                    print(json.dumps({"out": args.out, "rows": res.num_rows}))
                return 0
            if isinstance(res, rd.Dataset):
                rows = res.take(args.limit)
                n = res.count()
            else:
                rows = res.slice(0, args.limit).to_pylist()
                n = res.num_rows
            for r in rows:
                print(json.dumps(r, default=str))
            print(json.dumps({"rows_total": n, "shown": len(rows)}))
            return 0

        if args.cmd == "init":
            from .pipelines.replay import replay

            m = replay(
                args.stream,
                args.lake,
                num_partitions=args.partitions,
                upto_seq=args.to_seq,
            )
            print(json.dumps({"generation": m.generation, **m.totals()}))
        elif args.cmd == "purge":
            import pyarrow as pa
            import pyarrow.parquet as pq

            from .pipelines.purge import purge

            tbls = []
            if args.keys:
                tbls.append(pq.read_table(args.keys))
            if args.key:
                pairs = [
                    k.split("\t") if "\t" in k else k.split(",", 1)
                    for k in args.key
                ]
                tbls.append(pa.table({
                    "repo": [p[0] for p in pairs],
                    "path": [p[1] for p in pairs],
                }))
            if not tbls:
                print(json.dumps({"error": "need --keys or --key"}))
                return 1
            keys = pa.concat_tables(tbls, promote_options="permissive")
            print(json.dumps(purge(args.lake, keys)))
        elif args.cmd == "split":
            from .pipelines.replay import split_partitions
            from .state.manifest import load_latest

            m0 = load_latest(args.lake)
            if m0 is None:
                print(json.dumps({"error": "no committed manifest"}))
                return 1
            if args.bases:
                bases = [int(b) for b in args.bases.split(",")]
            else:
                bases = sorted(
                    {
                        int(pid) % m0.num_partitions
                        for pid, e in m0.partitions.items()
                        if e.num_rows > args.threshold
                    }
                )
            if not bases:
                print(json.dumps({"split": [], "generation": m0.generation}))
                return 0
            m = split_partitions(args.lake, bases)
            print(json.dumps({
                "split": bases,
                "generation": m.generation,
                "split_depths": {str(k): v for k, v in sorted(m.split_depths.items())},
                "num_files": sum(1 for e in m.partitions.values() if e.file),
            }))
        elif args.cmd == "sync":
            from .pipelines.tail import sync

            wire = None
            if args.wire:
                if not args.wire_src:
                    p.error("--wire requires --wire-src")
                if args.wire == "wal":
                    from .sources.wal import WalTail

                    wire = WalTail(args.wire_src, args.stream)
                else:
                    from .sources.debezium import DebeziumTail

                    wire = DebeziumTail(args.wire_src, args.stream)
            dedup_counts: list[int] = []
            reports = sync(
                args.stream,
                args.lake,
                wire=wire,
                max_ticks=args.ticks,
                check_every=args.check_every,
                num_partitions=args.partitions,
                dedup_index_root=args.dedup_index,
                dedup_threshold=args.dedup_threshold,
                export_out=args.export_out,
                watch=args.watch,
                watch_timeout_s=args.watch_timeout,
                on_dedup_pairs=(
                    (lambda t, p: dedup_counts.append(p.num_rows))
                    if args.dedup_index
                    else None
                ),
            )
            print(
                json.dumps(
                    {
                        "ticks": args.ticks,
                        "checks": [r.__dict__ for r in reports],
                        **(
                            {"dedup_pairs_per_tick": dedup_counts}
                            if args.dedup_index
                            else {}
                        ),
                    }
                )
            )
        elif args.cmd == "dedup-tick":
            import pyarrow.parquet as pq

            import ray.data

            from .pipelines.dedup_index import MinHashIndex

            idx = MinHashIndex(args.index)
            docs = ray.data.read_parquet(args.docs, columns=["doc_id", "text"])
            pairs = idx.dedup_tick(docs, threshold=args.threshold)
            if args.out:
                pq.write_table(pairs, args.out)
            if args.compact:
                idx.compact()
            print(json.dumps({"pairs": pairs.num_rows,
                              "out": args.out, "compacted": args.compact}))
        elif args.cmd == "ann-tick":
            import ray.data

            from .pipelines.ann_index import IvfIndex

            idx = IvfIndex(args.index, n_centroids=args.centroids)
            vecs = ray.data.read_parquet(
                args.vectors, columns=["vec_id", "embedding"]
            )
            n = idx.add_tick(vecs)
            print(json.dumps({"added": n, "trained": idx.trained}))
        elif args.cmd == "ann-query":
            import numpy as np
            import pyarrow.parquet as pq

            from .pipelines.ann_index import IvfIndex

            idx = IvfIndex(args.index)  # params come from the index config
            qt = pq.read_table(args.queries, columns=["vec_id", "embedding"])
            qids = qt.column("vec_id").to_numpy(zero_copy_only=False)
            qmat = np.stack(
                [np.asarray(v, np.float64)
                 for v in qt.column("embedding").to_pylist()]
            )
            out = idx.query(qids, qmat, k=args.k, n_probe=args.n_probe)
            if args.out:
                pq.write_table(out, args.out)
            print(json.dumps({"rows": out.num_rows, "out": args.out}))
        elif args.cmd == "land":
            if args.format == "debezium":
                from .sources.debezium import land_debezium_jsonl

                print(json.dumps(land_debezium_jsonl(args.src, args.out)))
            else:
                from .sources.wal import land_wal_segments

                since = {}
                if args.offsets and os.path.exists(args.offsets):
                    with open(args.offsets) as fh:
                        since = json.load(fh)
                info = land_wal_segments(args.src, args.out, since=since)
                if args.offsets:
                    with open(args.offsets, "w") as fh:
                        json.dump(info["offsets"], fh)
                print(json.dumps({k: v for k, v in info.items()
                                  if k != "offsets"}))
        elif args.cmd in ("init-fanout", "sync-fanout", "check-fanout"):
            import importlib

            mod_name, _, attr = args.tables.partition(":")
            if not attr:
                p.error("--tables must be 'module.path:callable'")
            tables = getattr(importlib.import_module(mod_name), attr)()

            if args.cmd == "init-fanout":
                from .pipelines.fanout import replay_fanout

                m = replay_fanout(
                    args.stream, args.lake, tables,
                    num_partitions=args.partitions, upto_seq=args.to_seq,
                )
                print(json.dumps({
                    "generation": m.generation,
                    "tables": {n: ts.num_partitions
                               for n, ts in m.tables.items()},
                }))
            elif args.cmd == "sync-fanout":
                from .pipelines.tail import sync_fanout

                out = sync_fanout(
                    args.stream, args.lake, tables,
                    max_ticks=args.ticks, check_every=args.check_every,
                    num_partitions=args.partitions,
                    export_out=args.export_out,
                    watch=args.watch,
                    watch_timeout_s=args.watch_timeout,
                )
                # with check_every the loop returns (manifest, reports);
                # a --watch run that idles out before tick 0 has no
                # manifest at all
                m, reports = out if isinstance(out, tuple) else (out, [])
                print(json.dumps({
                    "ticks": args.ticks,
                    "generation": m.generation if m is not None else None,
                    "checks": [
                        {n: r.__dict__ for n, r in rep.items()}
                        for rep in reports
                    ],
                }))
            else:
                from .pipelines.check import (
                    check_and_repair_fanout,
                    check_fanout,
                )

                fn = check_and_repair_fanout if args.repair else check_fanout
                reports = fn(args.stream, args.lake, tables)
                print(json.dumps({n: r.__dict__ for n, r in reports.items()}))
                if args.repair and not all(r.ok for r in reports.values()):
                    # fn returns PRE-repair reports; verify the heal
                    reports = check_fanout(args.stream, args.lake, tables)
                    print(json.dumps(
                        {n: r.__dict__ for n, r in reports.items()}
                    ))
                return 0 if all(r.ok for r in reports.values()) else 1
        elif args.cmd == "check":
            from .pipelines.check import check, repair

            report = check(args.stream, args.lake)
            print(json.dumps(report.__dict__))
            if args.repair and not report.ok:
                repair(args.stream, args.lake, report.bad_partitions)
                report2 = check(args.stream, args.lake)
                print(json.dumps(report2.__dict__))
                return 0 if report2.ok else 1
            return 0 if report.ok else 1
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
