"""`python -m vaex_tpu` CLI.

Counterpart of /root/reference/packages/vaex-core/vaex/__main__.py:24-105
(`vaex` entry: webserver/convert/benchmark/meta/alias/stat/settings) +
convert.py:101.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser("vaex_tpu", description="TPU-native out-of-core DataFrame engine")
    sub = parser.add_subparsers(dest="command")

    p_convert = sub.add_parser("convert", help="convert between file formats (hdf5/arrow/parquet/csv)")
    p_convert.add_argument("input")
    p_convert.add_argument("output")
    p_convert.add_argument("--chunk-size", type=int, default=None)

    p_stat = sub.add_parser("stat", help="print basic statistics of a file")
    p_stat.add_argument("input")

    p_settings = sub.add_parser("settings", help="show settings")
    p_settings.add_argument("format", nargs="?", default="json", choices=["json", "yaml", "md"])

    p_bench = sub.add_parser("benchmark", help="run the 2D binned-stats benchmark")
    p_bench.add_argument("--rows", type=int, default=1 << 24)
    p_bench.add_argument("--repeats", type=int, default=3)

    p_server = sub.add_parser("server", help="serve files over websocket RPC")
    p_server.add_argument("files", nargs="+")
    p_server.add_argument("--host", default="localhost")
    p_server.add_argument("--port", type=int, default=8765)
    p_server.add_argument("--token", default=None)
    p_server.add_argument("--rest", action="store_true", help="also serve the REST API")
    p_server.add_argument("--rest-port", type=int, default=8080)

    p_meta = sub.add_parser("meta", help="print file metadata (schema, row count)")
    p_meta.add_argument("input")

    p_alias = sub.add_parser("alias", help="manage path aliases (reference: misc_cmdline.alias_main)")
    alias_sub = p_alias.add_subparsers(dest="alias_task")
    alias_sub.add_parser("list", help="list aliases")
    p_alias_add = alias_sub.add_parser("add", help="add alias")
    p_alias_add.add_argument("name")
    p_alias_add.add_argument("path")
    p_alias_add.add_argument("-f", "--force", action="store_true", help="overwrite existing alias")
    p_alias_remove = alias_sub.add_parser("remove", help="remove alias")
    p_alias_remove.add_argument("name")

    args = parser.parse_args(argv)
    if args.command is None:
        parser.print_help()
        return 1

    import vaex_tpu as vaex

    if args.command == "convert":
        df = vaex.open(args.input)
        df.export(args.output, chunk_size=args.chunk_size)
        print(f"converted {args.input} -> {args.output} ({len(df):,} rows)")
    elif args.command == "stat":
        df = vaex.open(args.input)
        print(f"rows: {len(df):,}")
        print(df.describe())
    elif args.command == "meta":
        df = vaex.open(args.input)
        meta = {"rows": len(df), "columns": {name: str(df.data_type(name)) for name in df.get_column_names()}}
        print(json.dumps(meta, indent=2))
    elif args.command == "alias":
        if args.alias_task == "add":
            if args.name in vaex.aliases and not args.force:
                print(f"alias {args.name!r} exists (use --force to overwrite)")
                return 1
            vaex.aliases[args.name] = args.path
        elif args.alias_task == "remove":
            del vaex.aliases[args.name]
        else:
            for name in sorted(vaex.aliases.keys()):
                print(f"{name}: {vaex.aliases[name]}")
    elif args.command == "settings":
        from . import settings
        data = settings.main.as_dict()
        if args.format == "json":
            print(json.dumps(data, indent=2, default=str))
        elif args.format == "md":
            for section, values in data.items():
                print(f"## {section}")
                if isinstance(values, dict):
                    for k, v in values.items():
                        print(f"- {k}: {v}")
                else:
                    print(f"- {values}")
        else:
            try:
                import yaml
                print(yaml.dump(data))
            except ImportError:
                print(json.dumps(data, indent=2, default=str))
    elif args.command == "benchmark":
        import os
        os.environ["BENCH_ROWS"] = str(args.rows)
        os.environ["BENCH_REPEATS"] = str(args.repeats)
        sys.path.insert(0, ".")
        import importlib
        bench = importlib.import_module("bench")
        bench.main()
    elif args.command == "server":
        dataframes = {}
        for path in args.files:
            df = vaex.open(path)
            name = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
            dataframes[name] = df
        print(f"serving {list(dataframes)} on ws://{args.host}:{args.port}")
        server = vaex.serve(dataframes, host=args.host, port=args.port, token=args.token)
        if args.rest:
            from .server.rest import serve_rest
            print(f"REST on http://{args.host}:{args.rest_port}")
            serve_rest(dataframes, host=args.host, port=args.rest_port)
        else:
            try:
                server._thread.join()
            except KeyboardInterrupt:
                server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
