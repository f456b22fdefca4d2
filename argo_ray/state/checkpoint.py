"""Per-partition checkpoint manifest + resume (north rule: "a killed job
resumes from the last committed partition").

Layout::

    out_dir/
      partitions/part=<pid>/...        # parquet triple shards (atomic)
      manifest/part-<pid>.json         # one lineage record per partition

A partition commits by renaming its temp output directory into place and
then writing its manifest record (write-temp + ``os.replace`` — atomic
on POSIX).  ``resume`` = skip every partition that already has a
manifest record; deterministic skolemization (SURVEY.md §1.4) makes
re-running a half-finished partition idempotent.

Lineage per record (reference precedent: the CLI's counters
``TriplesProcessed``/``Rewritten`` + wall-clock report,
``/root/reference/rdf/rdf.go:42-43,408,422-424``): input fragments,
stage versions, row counts in/out, output files, wall seconds.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

# Bump when a stage's semantics change — manifests carry the versions so
# a resume can detect stale partitions (driver policy decides whether to
# invalidate).
STAGE_VERSIONS = {
    "synth_pages": 1,
    "rdfa_extract": 1,
    "dedup_exact": 1,
}

# the multi-syntax KG build (--pipeline multisyntax) versions
MULTI_STAGE_VERSIONS = {
    "synth_pages": 1,
    "rdfa_extract": 1,
    "microdata_extract": 1,
    "jsonld_extract": 1,
    "dedup_exact": 1,
}

# the corpus-cleaning job (--pipeline clean) versions independently
CLEAN_STAGE_VERSIONS = {
    "quality_gate": 1,
    "pii_redact": 1,
    "normalize": 1,
    # v2: environment-independent FNV-1a 128-bit fingerprint pair
    # (hasher="stable") — v1 persisted polars-version-dependent hash64
    # keys, which a resume under a different polars build would not
    # reproduce (shards would mix two hash families)
    "fingerprint": 2,
}


def _commit_shard(ds, out_dir: str, pid: int) -> tuple[int, list[str]]:
    """Atomic per-partition commit shared by both pipeline runners:
    write the Dataset to ``part=<pid>.tmp``, count rows from parquet
    METADATA (no re-read of data), then ``os.replace`` into place —
    atomic on POSIX.  Returns (row_count, output_files)."""
    import shutil

    import pyarrow.parquet as pq

    final_dir = os.path.join(out_dir, "partitions", f"part={pid}")
    tmp_dir = final_dir + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    ds.write_parquet(tmp_dir)
    n_rows = sum(
        pq.read_metadata(os.path.join(tmp_dir, f)).num_rows
        for f in os.listdir(tmp_dir)
        if f.endswith(".parquet")
    )
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)
    return n_rows, sorted(os.listdir(final_dir))


class CheckpointManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "manifest")
        self.partitions_dir = os.path.join(out_dir, "partitions")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.partitions_dir, exist_ok=True)

    def completed(self) -> dict[int, dict]:
        out = {}
        for name in os.listdir(self.manifest_dir):
            if name.startswith("part-") and name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    rec = json.load(f)
                out[rec["partition_id"]] = rec
        return out

    def commit(self, record: dict) -> None:
        pid = record["partition_id"]
        path = os.path.join(self.manifest_dir, f"part-{pid}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f, sort_keys=True)
        os.replace(tmp, path)


def plan_partitions(sf_dir: str, num_partitions: int) -> list[dict]:
    """Partition the input deterministically.

    Multi-file corpus (the 100 TB layout — a directory of shards): the
    unit is the input fragment; each partition reads ONLY its file
    subset, no filtering, no re-reads.  Single-file testdata: fall back
    to doc_id hash classes over the one file (each partition re-reads
    the small file — acceptable only at test scale, and the manifest
    records which mode ran).
    """
    import glob

    files = sorted(
        glob.glob(os.path.join(sf_dir, "documents*.parquet"))
        + glob.glob(os.path.join(sf_dir, "documents", "*.parquet"))
    )
    if len(files) > 1:
        n = min(num_partitions, len(files))
        return [
            {
                "partition_id": pid,
                "input_fragments": files[pid::n],
                "predicate": None,
            }
            for pid in range(n)
        ]
    path = f"{sf_dir}/documents.parquet"
    return [
        {
            "partition_id": pid,
            "input_fragments": [path],
            "predicate": {"column": "doc_id", "mod": num_partitions, "rem": pid},
        }
        for pid in range(num_partitions)
    ]


import ray


@ray.remote(num_cpus=0)
class StageCounters:
    """Pipeline counters (operator A3 — the reference's
    ``TriplesProcessed``/``Rewritten`` CLI counters,
    ``rdf/rdf.go:42-43,408``): a zero-CPU actor the stages increment
    per batch, so the lineage record gets per-stage row counts from the
    SAME single pass that writes the output (previously each count was
    its own full pipeline execution).

    Increments carry an optional idempotency ``token``: a retried task
    (OOM/preemption) re-runs its batches and would otherwise
    double-count; the token (task id + batch ordinal) makes the retry a
    no-op, keeping lineage counts exact under fault recovery."""

    def __init__(self):
        self.counts: dict[str, int] = {}
        self._seen: set = set()

    def add(self, key: str, n: int, token=None) -> None:
        if token is not None:
            if (key, token) in self._seen:
                return
            self._seen.add((key, token))
        self.counts[key] = self.counts.get(key, 0) + n

    def get(self) -> dict[str, int]:
        return dict(self.counts)


# per-worker batch ordinal per (task, stage): a retried task replays the
# same ordinals, so its tokens dedupe in the actor.  Residual window: a
# retry scheduled onto the SAME worker process continues the old
# ordinal sequence (new tokens → counted again); retries normally land
# on a fresh worker, and the alternative (content-hash tokens) would
# UNDER-count legitimately identical batches, which is worse.
_batch_ordinals: dict = {}
_current_task: list = [None]


def _counting(counters, key: str):
    """Wrap a passthrough count around a stage boundary.  The per-batch
    ``ray.get`` makes the increment synchronous, so when the pipeline's
    last task finishes every count has landed (fire-and-forget would
    race the final read); the round-trip is microseconds against
    seconds of per-batch extraction work."""

    def fn(b: pa.Table) -> pa.Table:
        try:
            task_id = ray.get_runtime_context().get_task_id()
        except Exception:
            task_id = None
        if task_id != _current_task[0]:  # new task on this worker —
            _batch_ordinals.clear()      # drop finished tasks' entries
            _current_task[0] = task_id
        ord_key = (task_id, key)
        ordinal = _batch_ordinals.get(ord_key, 0)
        _batch_ordinals[ord_key] = ordinal + 1
        token = (task_id, ordinal) if task_id is not None else None
        ray.get(counters.add.remote(key, b.num_rows, token))
        return b

    return fn


def run_partition(spec: dict, out_dir: str, salt: str = "") -> dict:
    """Run the flagship pipeline for one partition and atomically commit
    its parquet shard — ONE streaming pass: row counts come from the
    counter actor, the deduped count from the written parquet metadata.
    Returns the lineage record (not yet committed)."""
    import ray.data as rd

    from ..pages import synth_pages_batch
    from ..sources.rdfa import extract_rdfa_batch
    from ..stages.materialize import dedup_exact

    pid = spec["partition_id"]
    pred = spec.get("predicate")
    t0 = time.time()
    counters = StageCounters.remote()

    ds = rd.read_parquet(spec["input_fragments"])
    if pred is not None:
        import numpy as np

        def part_filter(b: pa.Table) -> pa.Table:
            vals = b[pred["column"]].to_numpy(zero_copy_only=False).astype(np.int64)
            return b.filter(pa.array(vals % pred["mod"] == pred["rem"]))

        ds = ds.map_batches(part_filter, batch_format="pyarrow")
    ds = ds.map_batches(_counting(counters, "documents"), batch_format="pyarrow")
    pages = ds.map_batches(synth_pages_batch, batch_format="pyarrow")
    triples = pages.map_batches(
        lambda b: extract_rdfa_batch(b, salt=salt), batch_format="pyarrow"
    ).map_batches(_counting(counters, "triples_raw"), batch_format="pyarrow")
    deduped = dedup_exact(triples)

    n_deduped, output_files = _commit_shard(deduped, out_dir, pid)

    counts = ray.get(counters.get.remote())
    return {
        "partition_id": pid,
        "pipeline": "kg",
        "input_fragments": spec["input_fragments"],
        "predicate": spec.get("predicate"),
        "salt": salt,
        "stage_versions": STAGE_VERSIONS,
        "row_counts": {
            "documents": counts.get("documents", 0),
            "triples_raw": counts.get("triples_raw", 0),
            "triples_deduped": n_deduped,
        },
        "output_files": output_files,
        "wall_sec": round(time.time() - t0, 3),
        "committed_at_unix": int(time.time()),
    }


def run_partition_multisyntax(spec: dict, out_dir: str, salt: str = "") -> dict:
    """One partition of the multi-syntax KG build: the documents slice
    synthesizes its RDFa, microdata and embedded-JSON-LD page families,
    each streams through its own extractor, the three triple streams
    union under one pinned schema, and the skew-proof dedup commits one
    parquet shard — the run-resumable form of kg_multisyntax_build."""
    import ray.data as rd

    from ..pages import synth_jsonld_batch, synth_microdata_batch, synth_pages_batch
    from ..sources.jsonld_html import extract_jsonld_batch
    from ..sources.microdata import extract_microdata_batch
    from ..sources.rdfa import extract_rdfa_batch
    from ..stages.materialize import dedup_exact
    from ..terms import cast_triple_schema as norm

    pid = spec["partition_id"]
    pred = spec.get("predicate")
    t0 = time.time()
    counters = StageCounters.remote()

    ds = rd.read_parquet(spec["input_fragments"])
    if pred is not None:
        import numpy as np

        def part_filter(b: pa.Table) -> pa.Table:
            vals = b[pred["column"]].to_numpy(zero_copy_only=False).astype(np.int64)
            return b.filter(pa.array(vals % pred["mod"] == pred["rem"]))

        ds = ds.map_batches(part_filter, batch_format="pyarrow")
    ds = ds.map_batches(
        _counting(counters, "documents"), batch_format="pyarrow"
    ).materialize()  # consumed by three branches

    branches = []
    for synth, extract, cname in (
        (synth_pages_batch, lambda b: extract_rdfa_batch(b, salt=salt), "rdfa"),
        (
            synth_microdata_batch,
            lambda b: extract_microdata_batch(b, salt=salt),
            "microdata",
        ),
        (synth_jsonld_batch, extract_jsonld_batch, "jsonld"),
    ):
        branches.append(
            ds.map_batches(synth, batch_format="pyarrow")
            .map_batches(extract, batch_format="pyarrow")
            .map_batches(_counting(counters, f"triples_{cname}"), batch_format="pyarrow")
            .map_batches(norm, batch_format="pyarrow")
        )
    unioned = branches[0].union(branches[1]).union(branches[2])
    deduped = dedup_exact(unioned)

    n_deduped, output_files = _commit_shard(deduped, out_dir, pid)

    counts = ray.get(counters.get.remote())
    return {
        "partition_id": pid,
        "pipeline": "multisyntax",
        "input_fragments": spec["input_fragments"],
        "predicate": spec.get("predicate"),
        "salt": salt,
        "stage_versions": MULTI_STAGE_VERSIONS,
        "row_counts": {
            "documents": counts.get("documents", 0),
            "triples_rdfa": counts.get("triples_rdfa", 0),
            "triples_microdata": counts.get("triples_microdata", 0),
            "triples_jsonld": counts.get("triples_jsonld", 0),
            "triples_deduped": n_deduped,
        },
        "output_files": output_files,
        "wall_sec": round(time.time() - t0, 3),
        "committed_at_unix": int(time.time()),
    }


def run_partition_clean(spec: dict, out_dir: str) -> dict:
    """Run the corpus-cleaning pipeline for one partition and commit its
    shard atomically: quality gate (word count >= 20 AND >= 1 en
    stopword, the docs_clean_pipeline thresholds) → PII redaction →
    text normalization → content fingerprint.  Output columns:
    (doc_id, clean, fingerprint).  Same lineage/commit discipline as
    the KG partition runner."""
    import ray.data as rd

    from ..functions.privacy import redact_pii_batch
    from ..functions.text import fingerprint_batch, normalize_batch, quality_batch

    pid = spec["partition_id"]
    pred = spec.get("predicate")
    t0 = time.time()
    counters = StageCounters.remote()

    ds = rd.read_parquet(spec["input_fragments"], columns=["doc_id", "text"])
    if pred is not None:
        import numpy as np

        def part_filter(b: pa.Table) -> pa.Table:
            vals = b[pred["column"]].to_numpy(zero_copy_only=False).astype(np.int64)
            return b.filter(pa.array(vals % pred["mod"] == pred["rem"]))

        ds = ds.map_batches(part_filter, batch_format="pyarrow")
    ds = ds.map_batches(_counting(counters, "documents"), batch_format="pyarrow")

    def clean(b: pa.Table) -> pa.Table:
        q = quality_batch(b)
        keep = pc.and_(
            pc.greater_equal(q["n_words"], pa.scalar(20, pa.int64())),
            pc.greater_equal(q["n_stopwords"], pa.scalar(1, pa.int64())),
        )
        kept = b.filter(keep)
        redacted = redact_pii_batch(kept)
        normed = normalize_batch(
            redacted.select(["doc_id"]).append_column("text", redacted["clean"])
        )
        # "stable" hasher (FNV-1a pair): these fingerprints are PERSISTED
        # into resumable shards, so they must reproduce across polars
        # versions — the "fast" polars family is for within-run keys only
        fp = fingerprint_batch(normed, text_column="norm_text", hasher="stable")
        return pa.table(
            {
                "doc_id": pc.cast(fp["doc_id"], pa.int64()),
                "clean": pc.cast(fp["norm_text"], pa.string()),
                "fingerprint": fp["fingerprint"],
                "fingerprint2": fp["fingerprint2"],
            }
        )

    # no docs_kept counting stage: the kept count comes free from the
    # committed parquet metadata — a per-batch counter round-trip on the
    # write path would be paid for a number the record never reads
    out = ds.map_batches(clean, batch_format="pyarrow")

    n_kept, output_files = _commit_shard(out, out_dir, pid)

    counts = ray.get(counters.get.remote())
    return {
        "partition_id": pid,
        "pipeline": "clean",
        "input_fragments": spec["input_fragments"],
        "predicate": spec.get("predicate"),
        "salt": "",
        "stage_versions": CLEAN_STAGE_VERSIONS,
        "row_counts": {
            "documents": counts.get("documents", 0),
            "docs_kept": n_kept,
        },
        "output_files": output_files,
        "wall_sec": round(time.time() - t0, 3),
        "committed_at_unix": int(time.time()),
    }


class CheckpointMismatch(RuntimeError):
    """A committed partition's plan no longer matches the current plan
    (different --partitions value, changed input layout, or bumped stage
    versions) — resuming would silently mix incompatible partitionings
    (duplicated/missing documents).  ADVICE r1."""


def _spec_mismatch(
    rec: dict, spec: dict, salt: str = "", pipeline: str = "kg"
) -> list[str]:
    out = []
    if rec.get("pipeline", "kg") != pipeline:
        out.append("pipeline")
    if rec.get("input_fragments") != spec["input_fragments"]:
        out.append("input_fragments")
    if rec.get("predicate") != spec.get("predicate"):
        out.append("predicate")
    if pipeline in ("kg", "multisyntax") and rec.get("salt", "") != salt:
        # a different skolemization salt would mix two anon-id
        # namespaces over the same pages — incompatible outputs.
        # The clean pipeline has no skolemization (records carry
        # salt=""), so comparing against the CLI --salt there would
        # make every salted re-invocation unresumable.
        out.append("salt")
    expected = {
        "kg": STAGE_VERSIONS,
        "multisyntax": MULTI_STAGE_VERSIONS,
        "clean": CLEAN_STAGE_VERSIONS,
    }[pipeline]
    if rec.get("stage_versions") != expected:
        out.append("stage_versions")
    return out


def run_checkpointed(
    sf_dir: str,
    out_dir: str,
    num_partitions: int = 4,
    salt: str = "",
    on_mismatch: str = "error",
    pipeline: str = "kg",
) -> dict:
    """Resumable flagship run: skips partitions already committed in the
    manifest; returns a summary {completed, skipped, total_triples}.

    A committed record is only skipped when its plan (input fragments,
    partition predicate, stage versions) matches the current plan.  On
    mismatch: ``on_mismatch="error"`` (default) raises
    :class:`CheckpointMismatch`; ``"invalidate"`` discards the stale
    partition (manifest record + output shard) and re-runs it.
    """
    import shutil

    manifest = CheckpointManifest(out_dir)
    done = manifest.completed()
    skipped, completed = [], []
    plan = plan_partitions(sf_dir, num_partitions)
    # committed partitions that are NOT in the current plan (a shrunk
    # --partitions value): their output would double-count documents the
    # new plan re-covers — the same corruption as an in-plan mismatch
    planned_ids = {spec["partition_id"] for spec in plan}
    stale_ids = sorted(set(done) - planned_ids)
    if stale_ids:
        if on_mismatch != "invalidate":
            raise CheckpointMismatch(
                f"committed partitions {stale_ids} are outside the current "
                f"{num_partitions}-partition plan — resubmit with the "
                f"original plan, or pass on_mismatch='invalidate' to "
                f"discard them"
            )
        import shutil

        for pid in stale_ids:
            os.remove(os.path.join(manifest.manifest_dir, f"part-{pid}.json"))
            stale = os.path.join(manifest.partitions_dir, f"part={pid}")
            if os.path.exists(stale):
                shutil.rmtree(stale)
            del done[pid]
    for spec in plan:
        pid = spec["partition_id"]
        if pid in done:
            bad = _spec_mismatch(done[pid], spec, salt, pipeline)
            if not bad:
                skipped.append(pid)
                continue
            if on_mismatch != "invalidate":
                raise CheckpointMismatch(
                    f"partition {pid}: committed record differs from the "
                    f"current plan on {bad} — resubmit with the original "
                    f"plan, or pass on_mismatch='invalidate' to discard "
                    f"and re-run the stale partition"
                )
            os.remove(os.path.join(manifest.manifest_dir, f"part-{pid}.json"))
            stale = os.path.join(manifest.partitions_dir, f"part={pid}")
            if os.path.exists(stale):
                shutil.rmtree(stale)
        if pipeline == "clean":
            record = run_partition_clean(spec, out_dir)
        elif pipeline == "multisyntax":
            record = run_partition_multisyntax(spec, out_dir, salt)
        else:
            record = run_partition(spec, out_dir, salt)
        manifest.commit(record)
        completed.append(pid)
    count_key = "docs_kept" if pipeline == "clean" else "triples_deduped"
    total = sum(
        rec["row_counts"][count_key] for rec in manifest.completed().values()
    )
    summary = {
        "completed": completed,
        "skipped": skipped,
        "pipeline": pipeline,
        "out_dir": out_dir,
    }
    summary["total_docs_kept" if pipeline == "clean" else "total_triples_deduped"] = (
        total
    )
    return summary


PROV_NS = "http://www.w3.org/ns/prov#"
RUN_NS = "https://kg.example.org/run/"


def prov_triples_batch(batch: pa.Table) -> pa.Table:
    """Lineage records ``(partition_id, n_documents)`` → PROV-O triples
    (flattened 12-column layout): one ``prov:Activity`` per partition
    run, one ``prov:Entity`` per output shard, ``prov:wasGeneratedBy``
    linking them, and the document count as an ``xsd:integer`` literal
    — the KG-native rendering of the checkpoint manifest, so lineage
    is queryable with the same SPARQL engine as the data it describes.
    (Nondeterministic manifest fields — wall_sec, committed_at — are
    deliberately NOT exported; provenance must be re-derivable.)"""
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
    pids = batch["partition_id"].to_pylist()
    ndocs = batch["n_documents"].to_pylist()
    rows = []
    for pid, n in zip(pids, ndocs):
        act = f"{RUN_NS}part/{pid}"
        ent = f"{RUN_NS}shard/{pid}"
        rows.extend(
            [
                (act, RDF_TYPE, 0, f"{PROV_NS}Activity", "", ""),
                (ent, RDF_TYPE, 0, f"{PROV_NS}Entity", "", ""),
                (ent, f"{PROV_NS}wasGeneratedBy", 0, act, "", ""),
                (act, f"{RUN_NS}documents", 2, str(n), "", XSD_INT),
            ]
        )
    return pa.table(
        {
            "subj_kind": pa.array([0] * len(rows), pa.int64()),
            "subj_value": pa.array([r[0] for r in rows], pa.string()),
            "subj_lang": pa.array([""] * len(rows), pa.string()),
            "subj_datatype": pa.array([""] * len(rows), pa.string()),
            "pred_kind": pa.array([0] * len(rows), pa.int64()),
            "pred_value": pa.array([r[1] for r in rows], pa.string()),
            "pred_lang": pa.array([""] * len(rows), pa.string()),
            "pred_datatype": pa.array([""] * len(rows), pa.string()),
            "obj_kind": pa.array([r[2] for r in rows], pa.int64()),
            "obj_value": pa.array([r[3] for r in rows], pa.string()),
            "obj_lang": pa.array([r[4] for r in rows], pa.string()),
            "obj_datatype": pa.array([r[5] for r in rows], pa.string()),
        }
    )
