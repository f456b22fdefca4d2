"""Flagship KG-construction pipeline (north rule / SURVEY.md §3.1 RD shape):

    read_parquet(documents) → synth pages → map_batches(rdfa extract)
    → canonicalize → groupby(subject_hash) dedup → write Parquet + N-Triples

Every stage is a streaming Dataset transform; the single wide operation
is the ``subject_hash`` shuffle at materialization (SURVEY.md §7).
"""

from __future__ import annotations

from ..pages import pages_dataset
from ..sources.rdfa import extract_rdfa_batch
from ..stages.materialize import dedup_exact


def extract_triples(pages_ds, salt: str = ""):
    """pages Dataset → flattened triples Dataset (stateless tasks)."""
    return pages_ds.map_batches(
        lambda b: extract_rdfa_batch(b, salt=salt), batch_format="pyarrow"
    )


def flagship(sf_dir: str, dedup: bool = True, replicate: int = 1, skew: float = 0.0):
    """documents.parquet → deduplicated triple Dataset.  ``replicate``
    inflates the page corpus deterministically (scaling benchmark);
    ``skew`` makes that fraction of the volume copies of one page
    (adversarial hot-subject corpus — see pages_dataset)."""
    ds = extract_triples(pages_dataset(sf_dir, replicate=replicate, skew=skew))
    if dedup:
        ds = dedup_exact(ds)
    return ds
