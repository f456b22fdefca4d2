"""SPARQL REPL client (the reference's ``sparqlclient`` command,
``sparql/sparql/sparqlclient.go:140-279``) over the file-backed
services — §3.3 of SURVEY.md.

Same session shape as the reference, line-based: each input line is one
statement; Turtle-style ``PREFIX x: <u> .`` lines are trimmed into the
session prefix map (operator M12, ``trim_prefixes``); the verb word
dispatches — SELECT → ASCII table, ASK → ``Result: true/false``,
CONSTRUCT → serialization in the session format (``FORMAT <id>``
switches it via the S8 registry), update verbs → applied to the target
graph, anything else → error line.  Documented divergences from the
reference: session prefixes are injected into each query before
evaluation (the reference leaves resolution to the remote endpoint —
there is none here, so injection is what makes them useful), DESCRIBE
serves the subject-triples concise description (implementation-defined
per spec), and color output is dropped.

Usage::

    python -m argo_ray.sparql.client STORE_DIR [--graph URI] [--fuseki NAME]
"""

from __future__ import annotations

import argparse
import sys

from ..sources.sparql_results import trim_prefixes
from .parser import SparqlSyntaxError

_UPDATE_VERBS = {
    "INSERT", "DELETE", "LOAD", "CLEAR", "CREATE", "DROP", "COPY", "MOVE", "ADD",
}

DEFAULT_GRAPH = "urn:x-argo:default"


def _print_table(header: list[str], rows: list[list[str]], out) -> None:
    """The reference's Table.Print (sparqlclient.go:33-82): +--+
    boundaries, centered header, left-aligned cells."""
    widths = [len(h) for h in header]
    for row in rows:
        for i, cell in enumerate(row):
            widths[i] = max(widths[i], len(cell))

    def boundary():
        out.write("".join("+-" + "-" * w + "-" for w in widths) + "+\n")

    def center(s: str, w: int) -> str:
        pad = max(w - len(s), 0)
        return " " * (pad // 2) + s + " " * (pad - pad // 2)

    boundary()
    out.write("".join(f"| {center(h, w)} " for h, w in zip(header, widths)) + "|\n")
    boundary()
    for row in rows:
        out.write("".join(f"| {c.ljust(w)} " for c, w in zip(row, widths)) + "|\n")
    boundary()


def _with_prefixes(line: str, prefixes: dict[str, str]) -> str:
    decls = "".join(f"PREFIX {k}: <{v}>\n" for k, v in prefixes.items())
    return decls + line


def run_session(
    query_service,
    update_service,
    lines,
    out=None,
    err=None,
    prompt: bool = False,
) -> None:
    """Drive one REPL session over iterable input ``lines`` (the
    reference's mainloop, sparqlclient.go:186-279)."""
    from ..sources.registry import FORMATS, RESULT_FORMATS

    out = out or sys.stdout
    err = err or sys.stderr
    prefixes: dict[str, str] = {}
    fmt = FORMATS["rdfxml"]
    # SELECT rendering: ASCII table by default; ``FORMAT tsv|srx|srj``
    # switches to the S6 results registry's serializer (``FORMAT
    # table`` switches back)
    results_fmt = None

    it = iter(lines)
    while True:
        if prompt:
            out.write("> ")
            out.flush()
        raw = next(it, None)
        if raw is None:
            break
        line = trim_prefixes(raw.rstrip("\n"), prefixes).strip()
        if not line:
            continue
        verb = line.split(" ", 1)[0].upper()
        try:
            if verb == "SELECT":
                ds = query_service.select(_with_prefixes(line, prefixes))
                header = list(ds.schema().names)
                if results_fmt is not None:
                    from ..sources.sparql_results import (
                        parse_select_results_tsv,
                    )

                    # the engine's canonical rendering IS the TSV term
                    # syntax — reuse its parser to reach the binding-row
                    # shape every results serializer consumes
                    from ..sinks.sparql_results import select_dataset_to_tsv

                    doc = select_dataset_to_tsv(ds, header)
                    if results_fmt.id == "tsv":
                        out.write(doc)
                    else:
                        variables, rows = parse_select_results_tsv(doc)
                        out.write(results_fmt.serializer(variables, rows))
                        out.write("\n")
                    continue
                # aggregate results carry numeric cells — stringify all
                rows = [[str(r[h]) for h in header] for r in ds.take_all()]
                _print_table(header, rows, out)
            elif verb == "ASK":
                result = query_service.ask(_with_prefixes(line, prefixes))
                out.write(f"Result: {'true' if result else 'false'}\n")
            elif verb in ("CONSTRUCT", "DESCRIBE"):
                graph = query_service.graph(_with_prefixes(line, prefixes))
                tbl = _collect_triples(graph)
                ser = fmt.serializer
                if ser is None:
                    err.write(f"Error: format {fmt.id} cannot serialize\n")
                    continue
                # updateRev (sparqlclient.go:134-138): session prefixes
                # feed the serializer's prefix table, reversed
                out.write(ser(tbl, {v: k for k, v in prefixes.items()}))
            elif verb in _UPDATE_VERBS:
                update_service.update(_with_prefixes(line, prefixes))
                out.write("OK\n")
            elif verb == "FORMAT":
                name = line.split(" ", 1)[1].strip().lower() if " " in line else ""
                if name in FORMATS:
                    fmt = FORMATS[name]
                elif name in RESULT_FORMATS:
                    results_fmt = RESULT_FORMATS[name]
                elif name == "table":
                    results_fmt = None
                else:
                    err.write(f"Invalid format: {name}\n")
            else:
                err.write(f"Invalid command: {verb}\n")
        except (SparqlSyntaxError, ValueError) as e:
            err.write(f"Error: {e}\n")
    if prompt:
        out.write("\n")


def _collect_triples(ds):
    import pyarrow as pa

    from ..terms import TRIPLE_COLUMNS, triples_to_table

    rows = ds.map_batches(
        lambda b: b.select(TRIPLE_COLUMNS), batch_format="pyarrow"
    ).take_all()
    if not rows:
        return triples_to_table([], with_hash=False)
    return pa.Table.from_pylist(rows)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="sparqlclient",
        description="SPARQL query & update client over a file-backed store "
        "(reference: sparql/sparql/sparqlclient.go)",
    )
    ap.add_argument("store", help="graph-store directory (or Fuseki-style root with --fuseki)")
    ap.add_argument(
        "-g", "--graph", default=DEFAULT_GRAPH,
        help="named graph targeted by update verbs (default: %(default)s)",
    )
    ap.add_argument(
        "-f", "--fuseki", metavar="NAME",
        help="treat STORE as a FileFusekiService root and use dataset NAME's "
        "services (the reference's -f flag, sparqlclient.go:163-167)",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():  # standalone CLI owns its session
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    if args.fuseki:
        from ..fuseki import FileFusekiService

        dataset = FileFusekiService(args.store).dataset(args.fuseki)
        query_service = dataset.query_service()
        update_service = dataset.update_service(args.graph)
    else:
        from ..sinks.graphstore import FileGraphStore
        from .service import FileSparqlService

        store = FileGraphStore(args.store)
        update_service = FileSparqlService.from_graphstore(store, args.graph)
        # queries see the union of graphs; updates target --graph
        query_service = FileSparqlService.over_graphstore_dir(args.store)

    run_session(
        query_service,
        update_service,
        sys.stdin,
        prompt=sys.stdin.isatty(),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
