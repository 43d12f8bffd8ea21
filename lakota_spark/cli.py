"""CLI mirroring the reference's command surface (`lakota/cli.py:650-846`):

    lakota-spark -r /path/repo ls
    lakota-spark -r /path/repo create temp "timestamp timestamp*" "value float"
    lakota-spark -r /path/repo write temp/paris < data.csv
    lakota-spark -r /path/repo read temp/paris --mask "(< self.value 28)" \
        "(floor self.timestamp 'M')" "(max self.value)"
    lakota-spark -r /path/repo rev temp | len temp/paris | squash | gc ...

Column arguments containing ``(`` switch read into reduce mode, exactly
like the reference (`lakota/cli.py:307-314`).
"""

from __future__ import annotations

import argparse
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


def cmd_ls(args):
    repo = _repo(args)
    if args.path:
        print("\n".join(repo.collection(args.path).ls()))
    else:
        print("\n".join(repo.ls()))


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
    coll_label, series_label = _split(args.path)
    coll = repo.collection(coll_label)
    import io

    import pandas as pd

    data = pd.read_csv(
        args.file if args.file else io.StringIO(sys.stdin.read())
    )
    coll.series(series_label).write(data)
    print(f"wrote {len(data)} rows to {args.path}")


def cmd_read(args):
    from lakota_spark import sexpr

    repo = _repo(args)
    coll_label, series_label = _split(args.path)
    series = repo.collection(coll_label).series(series_label)
    df = series.frame(
        start=args.greater_than,
        stop=args.less_than,
        before=args.before,
        limit=args.limit,
        offset=args.offset,
    )
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
    print(pdf.to_csv(index=False).rstrip())


def cmd_len(args):
    repo = _repo(args)
    coll_label, series_label = _split(args.path)
    print(len(repo.collection(coll_label).series(series_label)))


def cmd_rev(args):
    repo = _repo(args)
    coll = repo.collection(args.label)
    for rev in coll.changelog.log():
        import datetime as dt

        ts = dt.datetime.fromtimestamp(rev.epoch).isoformat(timespec="seconds")
        print(f"{rev.parent[:12]} -> {rev.child[:24]}  {ts}")


def cmd_squash(args):
    repo = _repo(args)
    repo.collection(args.label).squash()
    print(f"squashed {args.label}")


def cmd_defrag(args):
    repo = _repo(args)
    repo.collection(args.label).defrag()
    print(f"defragged {args.label}")


def cmd_merge(args):
    repo = _repo(args)
    rev = repo.collection(args.label).merge()
    print(f"merged {args.label}" if rev else "nothing to merge")


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


def main(argv=None):
    p = argparse.ArgumentParser(prog="lakota-spark")
    p.add_argument(
        "-r", "--repo", default=os.environ.get("LAKOTA_SPARK_REPO", ".")
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("ls"); s.add_argument("path", nargs="?"); s.set_defaults(fn=cmd_ls)
    s = sub.add_parser("create")
    s.add_argument("label"); s.add_argument("columns", nargs="+")
    s.set_defaults(fn=cmd_create)
    s = sub.add_parser("write")
    s.add_argument("path"); s.add_argument("--file")
    s.set_defaults(fn=cmd_write)
    s = sub.add_parser("read")
    s.add_argument("path"); s.add_argument("columns", nargs="*")
    s.add_argument("--mask"); s.add_argument("--limit", type=int)
    s.add_argument("--offset", type=int); s.add_argument("--before")
    s.add_argument("--greater-than", "--start", dest="greater_than")
    s.add_argument("--less-than", "--stop", dest="less_than")
    s.set_defaults(fn=cmd_read)
    s = sub.add_parser("len"); s.add_argument("path"); s.set_defaults(fn=cmd_len)
    s = sub.add_parser("rev"); s.add_argument("label"); s.set_defaults(fn=cmd_rev)
    s = sub.add_parser("squash"); s.add_argument("label"); s.set_defaults(fn=cmd_squash)
    s = sub.add_parser("defrag"); s.add_argument("label"); s.set_defaults(fn=cmd_defrag)
    s = sub.add_parser("merge"); s.add_argument("label"); s.set_defaults(fn=cmd_merge)
    s = sub.add_parser("gc")
    s.add_argument("--timeout", type=float, default=0.0)
    s.set_defaults(fn=cmd_gc)
    s = sub.add_parser("delete"); s.add_argument("path"); s.set_defaults(fn=cmd_delete)
    s = sub.add_parser("export")
    s.add_argument("label"); s.add_argument("out")
    s.add_argument("--format", default="parquet")
    s.set_defaults(fn=cmd_export)

    # argparse can't intermix trailing positionals with optionals in
    # subparsers; collect leftover non-flag tokens as read columns
    args, extra = p.parse_known_args(argv)
    bad = [e for e in extra if e.startswith("-")]
    if bad or (extra and args.cmd != "read"):
        p.error(f"unrecognized arguments: {' '.join(extra)}")
    if extra:
        args.columns = [*(args.columns or []), *extra]
    args.fn(args)


if __name__ == "__main__":
    main()
