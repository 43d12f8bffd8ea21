"""CLI mirroring the reference's command surface (`lakota/cli.py:650-846`):

    lakota-spark -r /path/repo ls
    lakota-spark -r /path/repo create temp "timestamp timestamp*" "value float"
    lakota-spark -r /path/repo write temp/paris < data.csv
    lakota-spark -r /path/repo read temp/paris --mask "(< self.value 28)" \
        "(floor self.timestamp 'M')" "(max self.value)"
    lakota-spark -r /path/repo rev temp | len temp/paris | squash | gc ...
    lakota-spark -r /path/repo push /backup/repo | pull http://host:8080
    lakota-spark -r /path/repo import temp/paris data.csv
    lakota-spark -r /path/repo rename temp/paris temp/bxl | clone temp t2
    lakota-spark -r /path/repo trim temp | serve --port 8080

Column arguments containing ``(`` switch read into reduce mode, exactly
like the reference (`lakota/cli.py:307-314`); collection/series labels
resolve by unique prefix (`lakota/cli.py:254-277`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _repo(args):
    from lakota_spark.repo import Repo
    from lakota_spark.session import get_spark

    spark = get_spark("lakota-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return Repo(args.repo, spark)


def _split(path: str) -> tuple[str, str]:
    coll, _, series = path.partition("/")
    if not series:
        raise SystemExit(f"expected collection/series, got {path!r}")
    return coll, series


def _collection(repo, label):
    """Exact label, else unique-prefix resolution
    (`lakota/cli.py:254-262`)."""
    try:
        return repo.collection(label)
    except KeyError:
        match = [c for c in repo.ls() if c.startswith(label)]
        if len(match) == 1:
            return repo.collection(match[0])
        raise SystemExit(f'Collection "{label}" not found')


def _series(repo, path: str, auto_create: bool = False):
    """collection/series with unique-prefix resolution on BOTH parts
    (`lakota/cli.py:265-277`)."""
    c_label, s_label = _split(path)
    coll = _collection(repo, c_label)
    labels = coll.ls()
    if auto_create or s_label in labels:
        return coll.series(s_label)
    match = [s for s in labels if s.startswith(s_label)]
    if len(match) == 1:
        return coll.series(match[0])
    raise SystemExit(f"Series '{path}' not found")


def cmd_ls(args):
    repo = _repo(args)
    long = getattr(args, "long", False)
    if args.path:
        coll = repo.collection(args.path)
        if not long:
            print("\n".join(coll.ls()))
            return
        # long listing (`lakota ls -l`): per-series segment count, row
        # count and index span — metadata only, no Spark job
        snap = coll.snapshot()
        for label in coll.ls():
            segs = snap.for_label(label)
            n = snap.length(label)
            lo = min((tuple(s.start) for s in segs), default=())
            hi = max((tuple(s.stop) for s in segs), default=())
            span = f"{list(lo)} .. {list(hi)}" if segs else "-"
            print(f"{label}\t{len(segs)} segs\t{n} rows\t{span}")
    else:
        if not long:
            print("\n".join(repo.ls()))
            return
        for label in repo.ls():
            coll = repo.collection(label)
            labels = coll.ls()
            print(f"{label}\t{len(labels)} series\t{json.dumps(coll.schema.to_dict())}")


def cmd_create(args):
    from lakota_spark.schema import Schema

    repo = _repo(args)
    spec = {}
    kv = False
    for coldef in args.columns:
        parts = coldef.split()
        if parts == ["kv"]:
            kv = True
            continue
        name, type_and_flags = parts[0], " ".join(parts[1:])
        spec[name] = type_and_flags.replace(" *", "*")
    schema = Schema.kv_schema(**spec) if kv else Schema(**spec)
    repo.create_collection(schema, args.label)
    print(f"created {args.label}")


def cmd_write(args):
    repo = _repo(args)
    import io

    import pandas as pd

    data = pd.read_csv(
        args.file if args.file else io.StringIO(sys.stdin.read())
    )
    _series(repo, args.path, auto_create=True).write(data, root=args.root)
    print(f"wrote {len(data)} rows to {args.path}")


def cmd_read(args):
    from lakota_spark import sexpr

    repo = _repo(args)
    series = _series(repo, args.path)
    if args.paginate:
        # page stream (`lakota/cli.py` --paginate): one CSV block per page
        header = True
        for page in series.paginate(
            args.paginate, start=args.greater_than, stop=args.less_than
        ):
            print(page.toPandas().to_csv(index=False, header=header).rstrip())
            header = False
        return
    if args.tail:
        df = series.tail(
            args.tail,
            start=args.greater_than,
            stop=args.less_than,
            before=args.before,
            closed=args.closed,
            limit=args.limit,
            offset=args.offset,
        )
    else:
        # reference semantics slice FIRST, mask after — so the mask may
        # ride inside frame() (ordered-scan pushdown, round 10) only
        # when no limit/offset slice competes with it
        mask_in_frame = bool(args.mask) and args.limit is None and not args.offset
        df = series.frame(
            start=args.greater_than,
            stop=args.less_than,
            before=args.before,
            limit=args.limit,
            offset=args.offset,
            closed=args.closed,
            mask=args.mask if mask_in_frame else None,
        )
        if mask_in_frame:
            args = argparse.Namespace(**{**vars(args), "mask": None})
    if args.mask:
        df = sexpr.mask(df, args.mask)
    cols = args.columns or None
    if cols and any("(" in c for c in cols):  # reduce mode (`cli.py:307-314`)
        df = sexpr.reduce_frame(
            df, *cols, order_cols=list(series.schema.idx)
        )
    elif cols:
        df = df.select(*cols)
    pdf = df.toPandas()
    if getattr(args, "pretty", False):
        print(pdf.to_string(index=False))
    else:
        print(pdf.to_csv(index=False).rstrip())


def cmd_len(args):
    repo = _repo(args)
    print(len(_series(repo, args.path)))


def cmd_rev(args):
    import datetime as dt

    repo = _repo(args)
    labels = [args.label] if args.label else repo.ls()
    for label in labels:
        coll = _collection(repo, label)
        if not args.label or len(labels) > 1:
            print(f"{label}:")
        for rev in coll.changelog.log():
            ts = dt.datetime.fromtimestamp(rev.epoch).isoformat(
                timespec="seconds"
            )
            print(f"{rev.parent[:12]} -> {rev.child[:24]}  {ts}")


def cmd_stats(args):
    """Per-series storage report (`Collection.stats`) — metadata only,
    no Spark job: segments, rows, min/max segment size, clipped pieces,
    zone-map coverage."""
    repo = _repo(args)
    cols = ("series", "segments", "rows", "min_segment", "max_segment",
            "clipped", "zone_maps")
    header = f"{'collection/series':<32}" + "".join(
        f"{c:>12}" for c in cols[1:]
    )
    print(header)
    for label in _target_labels(repo, args):
        for row in repo.collection(label).stats():
            name = f"{label}/{row['series']}"
            print(
                f"{name:<32}"
                + "".join(f"{row[c]:>12}" for c in cols[1:])
            )


def cmd_squash(args):
    repo = _repo(args)
    _collection(repo, args.label).squash()
    print(f"squashed {args.label}")


def _target_labels(repo, args):
    """Multiple labels, or every collection when none given / --all
    (reference defrag/trim verbs, `lakota/cli.py:748-763`)."""
    labels = getattr(args, "labels", None) or []
    if getattr(args, "all", False) or not labels:
        return repo.ls()
    return [_collection(repo, lb).label for lb in labels]


def cmd_defrag(args):
    repo = _repo(args)
    for label in _target_labels(repo, args):
        repo.collection(label).defrag()
        print(f"defragged {label}")


def cmd_maintain(args):
    """Threshold-triggered housekeeping (`Collection.maintain`): squash
    past --max-revisions, defrag past --max-segments, no-op otherwise —
    cron-safe over every collection."""
    import datetime as dt

    repo = _repo(args)
    keep = (
        dt.timedelta(seconds=args.keep_seconds)
        if args.keep_seconds is not None
        else None
    )
    for label in _target_labels(repo, args):
        out = repo.collection(label).maintain(
            max_revisions=args.max_revisions,
            max_segments=args.max_segments,
            keep=keep,
        )
        print(
            f"{label}: {out['action'] or 'ok'} "
            f"(revisions={out['revisions']}, "
            f"max_segments={out['max_series_segments']})"
        )


def cmd_compact(args):
    """KV-only full-span resolved rewrite (`KVSeries.compact`, round
    13): one call from an overlapping layout to the pairwise-disjoint
    shape the fast reads and the Spark data source need."""
    repo = _repo(args)
    series = _series(repo, args.path)
    if not series.schema.kv:
        raise SystemExit(
            f'"{args.path}" is not a KV series — use defrag for '
            "interval collections"
        )
    series.compact()
    print(f"compacted {args.path}")


def cmd_trim(args):
    repo = _repo(args)
    for label in _target_labels(repo, args):
        repo.collection(label).trim(before=args.before)
        print(f"trimmed {label}")


def cmd_merge(args):
    repo = _repo(args)
    rev = _collection(repo, args.label).merge()
    print(f"merged {args.label}" if rev else "nothing to merge")


def cmd_push(args):
    from lakota_spark.repo import Repo

    repo = _repo(args)
    remote = Repo(args.remote, repo.spark)
    repo.push(remote, args.labels or None, shallow=args.shallow)
    print(f"pushed -> {args.remote}")


def cmd_pull(args):
    from lakota_spark.repo import Repo

    repo = _repo(args)
    remote = Repo(args.remote, repo.spark)
    repo.pull(remote, args.labels or None, shallow=args.shallow)
    print(f"pulled <- {args.remote}")


def cmd_import(args):
    repo = _repo(args)
    coll_label, series_label = _split(args.path)
    fmt = args.format
    if fmt == "auto":
        # extension sniff; jsonl files commonly end .jsonl or .json
        for ext, f in ((".csv", "csv"), (".jsonl", "jsonl"),
                       (".json", "jsonl"), (".orc", "orc")):
            if args.file.endswith(ext):
                fmt = f
                break
        else:
            fmt = "parquet"
    repo.import_series(coll_label, series_label, args.file, fmt=fmt)
    print(f"imported {args.file} -> {args.path}")


def cmd_rename(args):
    repo = _repo(args)
    if "/" in args.old:
        coll_label, old_series = _split(args.old)
        new_series = args.new.rpartition("/")[2]
        _collection(repo, coll_label).rename_series(old_series, new_series)
    else:
        repo.rename_collection(args.old, args.new)
    print(f"renamed {args.old} -> {args.new}")


def cmd_clone(args):
    repo = _repo(args)
    _collection(repo, args.label).clone(args.new_label)
    print(f"cloned {args.label} -> {args.new_label}")


def cmd_serve(args):
    from lakota_spark.server import _make_handler

    root = _repo(args).fs.local_path()
    if root is None:
        raise SystemExit("serve requires a local repo root")
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer((args.host, args.port), _make_handler(root))
    print(f"serving {root} on http://{args.host}:{httpd.server_address[1]}")
    httpd.serve_forever()


def cmd_web(args):
    """Browse UI (`web.py` — the reference's contrib lkweb role): works
    on ANY backend the repo opens (local/http/memory/object store), the
    UI reads through the engine API, never the filesystem."""
    from http.server import ThreadingHTTPServer

    from lakota_spark.web import _make_handler

    repo = _repo(args)
    httpd = ThreadingHTTPServer((args.host, args.port), _make_handler(repo))
    print(
        f"browse UI for {repo.fs.uri} on "
        f"http://{args.host}:{httpd.server_address[1]}"
    )
    httpd.serve_forever()


def cmd_gc(args):
    repo = _repo(args)
    stats = repo.gc(timeout=args.timeout)
    print(stats)


def cmd_delete(args):
    repo = _repo(args)
    if "/" in args.path:
        coll_label, series_label = _split(args.path)
        repo.collection(coll_label).delete_series(series_label)
    else:
        repo.delete_collection(args.path)
    print(f"deleted {args.path}")


def cmd_export(args):
    repo = _repo(args)
    repo.export_collection(args.label, args.out, fmt=args.format)
    print(f"exported {args.label} -> {args.out}")


def cmd_help(args):
    """`lakota help [verb]` (`lakota/cli.py` help verb): print the parser
    help, or the requested sub-command's."""
    parser, sub = _build_parser()
    if args.verb:
        choices = sub.choices
        if args.verb not in choices:
            print(f"unknown command {args.verb!r}")
            return
        choices[args.verb].print_help()
    else:
        parser.print_help()


def main(argv=None):
    p, sub = _build_parser()

    # argparse can't intermix trailing positionals with optionals in
    # subparsers; collect leftover non-flag tokens as read columns
    args, extra = p.parse_known_args(argv)
    bad = [e for e in extra if e.startswith("-")]
    if bad or (extra and args.cmd != "read"):
        p.error(f"unrecognized arguments: {' '.join(extra)}")
    if extra:
        args.columns = [*(args.columns or []), *extra]
    import time as _time

    t0 = _time.time()
    args.fn(args)
    if getattr(args, "timing", False):
        print(f"elapsed: {_time.time() - t0:.3f}s", file=sys.stderr)
    if getattr(args, "metrics", False):
        from lakota_spark.fsio import BaseFS

        for key, nbytes in sorted(BaseFS.metrics().items()):
            print(f"{key}: {nbytes}", file=sys.stderr)


def _build_parser():
    p = argparse.ArgumentParser(prog="lakota-spark")
    p.add_argument(
        "-r", "--repo", default=os.environ.get("LAKOTA_SPARK_REPO", ".")
    )
    p.add_argument(
        "--metrics", action="store_true",
        help="print per-backend I/O byte counters after the command",
    )
    p.add_argument(
        "--timing", "-t", action="store_true",
        help="print elapsed wall time after the command",
    )
    p.add_argument(
        "--pretty", "-P", action="store_true",
        help="tabulate read output instead of CSV",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("ls"); s.add_argument("path", nargs="?")
    s.add_argument("-l", "--long", action="store_true")
    s.set_defaults(fn=cmd_ls)
    s = sub.add_parser("create")
    s.add_argument("label"); s.add_argument("columns", nargs="+")
    s.set_defaults(fn=cmd_create)
    s = sub.add_parser("write")
    s.add_argument("path"); s.add_argument("--file")
    s.add_argument("--root", action="store_true")
    s.set_defaults(fn=cmd_write)
    s = sub.add_parser("read")
    s.add_argument("path"); s.add_argument("columns", nargs="*")
    s.add_argument("--mask"); s.add_argument("--limit", type=int)
    s.add_argument("--offset", type=int); s.add_argument("--before")
    s.add_argument("--greater-than", "--start", dest="greater_than")
    s.add_argument("--less-than", "--stop", dest="less_than")
    s.add_argument("--tail", type=int)
    s.add_argument("--paginate", type=int)
    s.add_argument("--closed", default="b",
                   choices=["b", "l", "r", "n", "BOTH", "LEFT", "RIGHT", "NONE"])
    s.set_defaults(fn=cmd_read)
    s = sub.add_parser("len", aliases=["length"])
    s.add_argument("path"); s.set_defaults(fn=cmd_len)
    s = sub.add_parser("version")
    s.set_defaults(fn=lambda a: print(__import__("lakota_spark").__version__))
    s = sub.add_parser("help")
    s.add_argument("verb", nargs="?")
    s.set_defaults(fn=cmd_help)
    s = sub.add_parser("rev"); s.add_argument("label", nargs="?"); s.set_defaults(fn=cmd_rev)
    s = sub.add_parser("squash"); s.add_argument("label"); s.set_defaults(fn=cmd_squash)
    s = sub.add_parser("defrag")
    s.add_argument("labels", nargs="*"); s.add_argument("-a", "--all", action="store_true")
    s.set_defaults(fn=cmd_defrag)
    s = sub.add_parser("maintain")
    s.add_argument("labels", nargs="*"); s.add_argument("-a", "--all", action="store_true")
    s.add_argument("--max-revisions", type=int, default=1024)
    s.add_argument("--max-segments", type=int, default=4096)
    # retain a time-travel window through triggered squashes
    s.add_argument("--keep-seconds", type=float, default=None)
    s.set_defaults(fn=cmd_maintain)
    s = sub.add_parser("compact")
    s.add_argument("path")
    s.set_defaults(fn=cmd_compact)
    s = sub.add_parser("trim")
    s.add_argument("labels", nargs="*"); s.add_argument("--before", type=float)
    s.add_argument("-a", "--all", action="store_true")
    s.set_defaults(fn=cmd_trim)
    s = sub.add_parser("stats")
    s.add_argument("labels", nargs="*")
    s.add_argument("-a", "--all", action="store_true")
    s.set_defaults(fn=cmd_stats)
    s = sub.add_parser("merge"); s.add_argument("label"); s.set_defaults(fn=cmd_merge)
    s = sub.add_parser("push")
    s.add_argument("remote"); s.add_argument("labels", nargs="*")
    s.add_argument("--shallow", action="store_true")
    s.set_defaults(fn=cmd_push)
    s = sub.add_parser("pull")
    s.add_argument("remote"); s.add_argument("labels", nargs="*")
    s.add_argument("--shallow", action="store_true")
    s.set_defaults(fn=cmd_pull)
    s = sub.add_parser("import")
    s.add_argument("path"); s.add_argument("file")
    s.add_argument(
        "--format",
        default="auto",
        choices=["auto", "csv", "parquet", "jsonl", "orc"],
    )
    s.set_defaults(fn=cmd_import)
    s = sub.add_parser("rename")
    s.add_argument("old"); s.add_argument("new")
    s.set_defaults(fn=cmd_rename)
    s = sub.add_parser("clone")
    s.add_argument("label"); s.add_argument("new_label")
    s.set_defaults(fn=cmd_clone)
    s = sub.add_parser("serve")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8080)
    s.set_defaults(fn=cmd_serve)
    s = sub.add_parser("web")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8081)
    s.set_defaults(fn=cmd_web)
    s = sub.add_parser("gc")
    # 600 s grace (reference default): trash younger than this survives a
    # second gc pass, protecting segments of in-flight commits
    s.add_argument("--timeout", type=float, default=600.0)
    s.set_defaults(fn=cmd_gc)
    s = sub.add_parser("delete", aliases=["del"])
    s.add_argument("path"); s.set_defaults(fn=cmd_delete)
    s = sub.add_parser("export")
    s.add_argument("label"); s.add_argument("out")
    s.add_argument(
        "--format", default="parquet",
        choices=["csv", "parquet", "jsonl", "orc"],
    )
    s.set_defaults(fn=cmd_export)
    return p, sub


if __name__ == "__main__":
    main()
