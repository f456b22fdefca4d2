"""File-backed Fuseki dataset-server equivalent.

The reference's ``fuseki`` package is endpoint wiring: a Service maps a
dataset name to a Dataset, and a Dataset wires query / update /
graph-store services onto its base URI (``fuseki/service.go:1-20``,
``fuseki/dataset.go:7-47``).  With no network in a pipeline worker, the
equivalent here is directory wiring: one dataset = one directory holding
a file-backed graph store, with the SPARQL query / update services
(``argo_ray.sparql``) evaluated over it.  The admin verbs Fuseki exposes
over HTTP (``/$/datasets`` create/list/delete) become directory ops.
"""

from __future__ import annotations

import os
import shutil

from .sinks.graphstore import FileGraphStore
from .sparql.service import FileSparqlService


class FileFusekiDataset:
    """``fuseki.Dataset`` analogue: services over one dataset directory.

    Layout: ``<base_dir>/data/`` is the graph store (one RDF/XML file
    per named graph — the ``GraphStoreEndpoint``); query and update
    services evaluate over it.
    """

    def __init__(self, base_dir: str):
        self.base_dir = base_dir.rstrip("/")

    # endpoint accessors (dataset.go:21-35) — paths instead of URIs
    def graph_store_path(self) -> str:
        return os.path.join(self.base_dir, "data")

    def graph_store(self) -> FileGraphStore:
        """dataset.go:44-46 ``GraphStoreService``."""
        return FileGraphStore(self.graph_store_path())

    def query_service(self) -> FileSparqlService:
        """dataset.go:36-38 ``QueryService``: SELECT/ASK/CONSTRUCT over
        the union of the dataset's named graphs (distributed fan-in)."""
        return FileSparqlService.over_graphstore_dir(self.graph_store_path())

    def update_service(self, graph_uri: str) -> FileSparqlService:
        """dataset.go:40-42 ``UpdateService``: query + SPARQL-Update
        against one named graph of this dataset."""
        return FileSparqlService.from_graphstore(self.graph_store(), graph_uri)


class FileFusekiService:
    """``fuseki.Service`` analogue plus the admin dataset verbs."""

    def __init__(self, root_dir: str):
        self.root = root_dir.rstrip("/")
        os.makedirs(self.root, exist_ok=True)

    def dataset(self, name: str) -> FileFusekiDataset:
        """service.go:17-19 — name → Dataset (created lazily on use)."""
        if "/" in name or name in ("", ".", ".."):
            raise ValueError(f"bad dataset name {name!r}")
        return FileFusekiDataset(os.path.join(self.root, name))

    def datasets(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )

    def create(self, name: str) -> FileFusekiDataset:
        ds = self.dataset(name)
        os.makedirs(ds.graph_store_path(), exist_ok=True)
        return ds

    def remove(self, name: str) -> None:
        ds = self.dataset(name)
        shutil.rmtree(ds.base_dir)
