"""CLI: ``python -m zcollection_spark ls|inspect|drop`` — parity with the
reference's ``zcollection ls/inspect/drop`` (``cli/main.py:27-113``)."""

from __future__ import annotations

import argparse
import json
import sys


def _open(path: str, mode: str = "r"):
    from . import get_spark, open_collection
    spark = get_spark("zcs-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return open_collection(spark, path, mode=mode)


def cmd_ls(args: argparse.Namespace) -> int:
    coll = _open(args.path)
    partitions = coll.partitions(filters=args.filter)
    if args.json:
        print(json.dumps(partitions, indent=1))
    else:
        for rel in partitions:
            print(rel)
    return 0


def cmd_inspect(args: argparse.Namespace) -> int:
    coll = _open(args.path)
    doc = {
        "path": coll.path,
        "axis": coll.axis,
        "partitioning": coll.partitioning.to_json(),
        "catalog_enabled": coll.catalog_enabled,
        "n_partitions": len(coll.partitions()),
        "dimensions": [
            {"name": d.name, "size": d.size} for d in
            coll.schema.dimensions],
        "variables": [
            {"name": v.name, "dtype": v.dtype,
             "dimensions": list(v.dimensions), "immutable": v.immutable}
            for v in coll.schema.variables],
    }
    print(json.dumps(doc, indent=1))
    return 0


def cmd_drop(args: argparse.Namespace) -> int:
    coll = _open(args.path, mode="rw")
    doomed = coll.partitions(filters=args.filter)
    if not doomed:
        print("nothing matches")
        return 0
    if not args.yes:
        print(f"would drop {len(doomed)} partitions:")
        for rel in doomed[:20]:
            print(f"  {rel}")
        answer = input("proceed? [y/N] ").strip().lower()
        if answer != "y":
            print("aborted")
            return 1
    dropped = coll.drop_partitions(filters=args.filter)
    print(f"dropped {len(dropped)} partitions")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="zcollection_spark")
    sub = parser.add_subparsers(dest="command", required=True)

    p_ls = sub.add_parser("ls", help="list partitions")
    p_ls.add_argument("path")
    p_ls.add_argument("--filter", default=None)
    p_ls.add_argument("--json", action="store_true")
    p_ls.set_defaults(fn=cmd_ls)

    p_in = sub.add_parser("inspect", help="show schema summary")
    p_in.add_argument("path")
    p_in.set_defaults(fn=cmd_inspect)

    p_drop = sub.add_parser("drop", help="drop partitions (guarded)")
    p_drop.add_argument("path")
    p_drop.add_argument("--filter", default=None)
    p_drop.add_argument("--yes", action="store_true",
                        help="skip confirmation")
    p_drop.set_defaults(fn=cmd_drop)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
