"""CLI entry points (own their Ray session, like bench.py).

  python -m jena_ray.cli riot --count file.nt file2.ttl ...
      parse/validate/convert RDF files (riotcmd/riot.java + CmdLangParse
      analog: default strict checking, counts + TPS report, optional
      --out nt export, --sink parquet)

  python -m jena_ray.cli kgload --sf-dir DIR --out OUT [--shards N]
      run the flagship KG-construction pipeline (tdbloader analog with
      LoadMonitor-style rate reporting)

  python -m jena_ray.cli sparql --loc IDX (--query TEXT | --query-file F)
      run a SPARQL query over a materialized index (jena-cmds arq /
      tdbquery analog; SELECT/ASK/CONSTRUCT/DESCRIBE subset in
      jena_ray/sparql.py)

  python -m jena_ray.cli update --loc IDX (--update TEXT | --update-file F)
      apply one SPARQL Update request and rebuild the indexes
      (jena-cmds update / tdbupdate analog, batch reload semantics)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)


def cmd_riot(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="jena_ray riot")
    ap.add_argument("files", nargs="+")
    ap.add_argument("--count", action="store_true", help="print triple counts + TPS")
    ap.add_argument("--nocheck", action="store_true", help="lenient term checking")
    ap.add_argument("--out", help="write N-Triples export to this directory")
    ap.add_argument("--sink", help="write parquet triple table to this directory")
    ap.add_argument(
        "--syntax-out",
        help="single-file export in a registry syntax (nt/nq/ttl/trig/trix/rj), "
        "written to stdout — RDFWriterRegistry analog",
    )
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)
    _init_ray(args.num_cpus)

    from jena_ray.sources.ntriples import read_nquads, read_ntriples, write_ntriples
    from jena_ray.turtle import read_turtle

    nt_files = [f for f in args.files if f.endswith((".nt",))]
    nq_files = [f for f in args.files if f.endswith((".nq",))]
    ttl_files = [f for f in args.files if f.endswith((".ttl", ".turtle"))]
    trig_files = [f for f in args.files if f.endswith((".trig",))]
    rdf_files = [f for f in args.files if f.endswith((".rdf", ".owl", ".xml"))]
    trix_files = [f for f in args.files if f.endswith((".trix",))]
    rj_files = [f for f in args.files if f.endswith((".rj",))]
    jsonld_files = [f for f in args.files if f.endswith((".jsonld",))]
    trdf_files = [f for f in args.files if f.endswith((".trdf", ".rt"))]
    other = [
        f
        for f in args.files
        if f
        not in nt_files + nq_files + ttl_files + trig_files + rdf_files
        + trix_files + rj_files + jsonld_files + trdf_files
    ]
    if other:
        print(f"unsupported syntax (by extension): {other}", file=sys.stderr)
        return 2

    datasets = []
    if nt_files:
        datasets.append(read_ntriples(nt_files, strict=not args.nocheck))
    if ttl_files:
        datasets.append(read_turtle(ttl_files).drop_columns(["src"]))
    if nq_files:
        from jena_ray.sources.ntriples import quads_to_triples

        datasets.append(quads_to_triples(read_nquads(nq_files, strict=not args.nocheck)))
    if trig_files:
        from jena_ray.trig import read_trig

        def _drop_g(t):
            return t.drop_columns(["graph", "src"])

        datasets.append(
            read_trig(trig_files).map_batches(_drop_g, batch_format="pyarrow")
        )
    if rdf_files:
        from jena_ray.rdfxml import read_rdfxml

        datasets.append(read_rdfxml(rdf_files).drop_columns(["src"]))
    if trdf_files:
        from jena_ray.thrift_rdf import read_thrift_files

        datasets.append(read_thrift_files(trdf_files))
    if trix_files or rj_files or jsonld_files:
        import pyarrow as pa
        import ray.data as rd

        from jena_ray.jsonld import parse_jsonld
        from jena_ray.rdfjson import parse_rdfjson
        from jena_ray.trix import parse_trix

        rows = []
        for f in trix_files:  # whole-file formats, one doc per task at scale
            rows += [(s, p, o) for _, s, p, o in parse_trix(open(f).read())]
        for f in rj_files:
            rows += parse_rdfjson(open(f).read())
        for f in jsonld_files:
            rows += [(s, p, o) for _, s, p, o in parse_jsonld(open(f).read())]
        cols = list(zip(*rows)) if rows else ([], [], [])
        datasets.append(
            rd.from_arrow(
                pa.table(
                    {k: pa.array(list(v), type=pa.string())
                     for k, v in zip(("subj", "pred", "obj"), cols)}
                )
            )
        )
    ds = datasets[0]
    for d in datasets[1:]:
        ds = ds.union(d)

    t0 = time.perf_counter()
    if args.sink:
        ds.write_parquet(args.sink)
        n = None
    if args.out:
        write_ntriples(ds, args.out)
    if args.syntax_out:
        from jena_ray.writers import DEFAULT_GRAPH, WRITERS

        unit, fn = WRITERS[args.syntax_out]
        triples = [tuple(r.values()) for r in ds.take_all()]
        data = triples if unit == "triples" else [(DEFAULT_GRAPH, *t) for t in triples]
        sys.stdout.write(fn(data))
    n = ds.count()
    dt = time.perf_counter() - t0
    if args.count:
        # CmdLangParse.java:373-375 style: triples + TPS
        print(json.dumps({"triples": n, "sec": round(dt, 3), "tps": round(n / dt, 2)}))
    import ray

    ray.shutdown()
    return 0


def cmd_kgload(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="jena_ray kgload")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)
    _init_ray(args.num_cpus)

    from jena_ray.pipelines.kg import run_kg

    m = run_kg(
        args.sf_dir,
        args.out,
        num_shards=args.shards,
        resume=not args.no_resume,
    )
    # LoadMonitor-style rate report (jena-tdb LoadMonitor.java:98,128)
    total_triples = sum(s["triples_out"] for s in m["shards"].values())
    total_rows = sum(s["rows_in"] for s in m["shards"].values())
    m["docs_per_sec"] = round(total_rows / m["total_sec"], 2) if total_rows else 0.0
    m["triples_per_sec"] = round(total_triples / m["total_sec"], 2) if total_triples else 0.0
    print(json.dumps(m))
    import ray

    ray.shutdown()
    return 0


def cmd_tdbstats(argv: list[str]) -> int:
    """tdbstats analog: scan a materialized index, write + print the
    stats side-car the BGP planner consumes (tdb/solver/stats/Stats.java,
    tdbstats command)."""
    ap = argparse.ArgumentParser(prog="jena_ray tdbstats")
    ap.add_argument("--loc", required=True, help="index dir (kgload --out)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)
    _init_ray(args.num_cpus)

    from jena_ray.pipelines.tdbstats import collect_stats

    print(json.dumps(collect_stats(args.loc)))
    import ray

    ray.shutdown()
    return 0


def cmd_sparql(argv: list[str]) -> int:
    """arq/tdbquery analog: SPARQL text → algebra → id-index execution,
    results printed as TSV (header + rows, like ResultSetFormatter's
    output variants)."""
    ap = argparse.ArgumentParser(prog="jena_ray sparql")
    ap.add_argument("--loc", required=True, help="index dir (kgload --out)")
    ap.add_argument("--query", help="query text")
    ap.add_argument("--query-file", help="file holding the query")
    ap.add_argument("--limit-print", type=int, default=50,
                    help="max rows printed in text mode (result is still "
                         "fully computed)")
    ap.add_argument("--results", choices=["text", "csv", "tsv", "json"],
                    default="text",
                    help="result-set format (arq --results analog; W3C "
                         "sparql-results CSV/TSV/JSON)")
    ap.add_argument("--explain", action="store_true",
                    help="print the SSE-style plan tree and exit "
                         "(arq --explain / tdbqueryplan analog)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if bool(args.query) == bool(args.query_file):
        ap.error("exactly one of --query / --query-file")
    text = args.query or open(args.query_file).read()
    if args.explain:
        from jena_ray.sparql import explain

        print(explain(text), end="")
        return 0
    _init_ray(args.num_cpus)

    import pyarrow as pa

    from jena_ray.sparql import sparql_query

    t0 = time.time()
    res = sparql_query(args.loc, text)
    df = res.to_pandas()  # pa.Table and Dataset both expose to_pandas
    n = len(df)
    if args.results != "text":
        from jena_ray.resultset import RESULT_WRITERS

        tb = pa.Table.from_pandas(df, preserve_index=False)
        print(RESULT_WRITERS[args.results](tb), end="")
    else:
        print("\t".join(df.columns))
        for _, row in df.head(args.limit_print).iterrows():
            print("\t".join("" if v is None else str(v) for v in row))
    print(f"# {n} rows in {time.time() - t0:.2f}s", file=sys.stderr)
    import ray

    ray.shutdown()
    return 0


def cmd_update(argv: list[str]) -> int:
    """tdbupdate analog: apply one SPARQL Update, rebuild the indexes."""
    ap = argparse.ArgumentParser(prog="jena_ray update")
    ap.add_argument("--loc", required=True, help="index dir (kgload --out)")
    ap.add_argument("--update", help="update request text")
    ap.add_argument("--update-file", help="file holding the request")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if bool(args.update) == bool(args.update_file):
        ap.error("exactly one of --update / --update-file")
    text = args.update or open(args.update_file).read()
    _init_ray(args.num_cpus)

    from jena_ray.sparql_update import sparql_update

    t0 = time.time()
    stats = sparql_update(args.loc, text)
    stats["sec"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    import ray

    ray.shutdown()
    return 0


def cmd_infer_rules(argv: list[str]) -> int:
    """GenericRuleReasoner (forward) analog: N-Triples + a Jena-syntax rule
    file → fixpoint-materialized N-Triples (stages/rules.forward_chain;
    jena-core reasoner/rulesys/GenericRuleReasoner.java:47)."""
    ap = argparse.ArgumentParser(prog="jena_ray infer-rules")
    ap.add_argument("--data", required=True, help="input .nt file/dir")
    ap.add_argument("--rules", required=True, help="rule file (Rule.java syntax)")
    ap.add_argument("--out", required=True, help="output parquet dir")
    ap.add_argument("--max-rounds", type=int, default=30)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)
    _init_ray(args.num_cpus)

    from jena_ray.sources.ntriples import read_ntriples
    from jena_ray.stages.rules import forward_chain

    with open(args.rules) as f:
        rules_text = f.read()
    out, rounds = forward_chain(
        read_ntriples(args.data), rules_text, max_rounds=args.max_rounds
    )
    out.write_parquet(args.out)
    print(json.dumps({"rounds": rounds, "triples": out.count()}))
    import ray

    ray.shutdown()
    return 0


def main() -> int:
    cmds = {"riot": cmd_riot, "kgload": cmd_kgload, "tdbstats": cmd_tdbstats,
            "sparql": cmd_sparql, "update": cmd_update,
            "infer-rules": cmd_infer_rules}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        print(__doc__)
        return 2
    return cmds[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    raise SystemExit(main())
