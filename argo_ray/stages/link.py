"""Entity linking (north rule; reference pattern T2 —
``mysqlstore/mysqlstore.go:64-108``'s lazily-populated term→id
dictionary caches are the single-process ancestor of this stage).

Mention detection happens at extraction time: literal objects of a
configured *mention predicate* (e.g. ``dc:title``) are the surface
forms.  Linking resolves each surface form against a candidate
dictionary ``surface form → entity IRI`` and asserts a new link triple
``(subject, link_pred, <entity>)``.

Two physical strategies:

- :class:`EntityLinker` — actor-pool ``map_batches`` stage.  The
  candidate dictionary is shipped **once per actor** via ``ray.put`` +
  ``ray.get`` in ``__init__`` (never per batch) — the broadcast path,
  right whenever the dictionary fits in worker memory.
- :func:`link_entities_join` — the scale path: mentions and candidates
  meet in a distributed hash join (``Dataset.join``), i.e. per-partition
  candidate dictionaries; use when the dictionary itself is too large to
  broadcast (100 TB-scale entity catalogs).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..terms import KIND_IRI, KIND_LITERAL

DEFAULT_LINK_PRED = "http://example.org/ns#about"


def build_candidates(docs_ds, keep: str = "min"):
    """documents Dataset → candidate table (surface_form, entity_iri).

    Surface form = the doc's title (first five words — the same
    derivation the page fixture uses); collisions resolve to the
    entity of the smallest doc_id (deterministic, oracle-reproducible).
    """
    from ray.data.aggregate import Min

    from ..pages import entity_iri, title_of

    def derive(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        titles = [title_of(t) for t in b["text"].to_pylist()]
        return pa.table(
            {
                "surface_form": pa.array(titles, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    agg = (
        docs_ds.map_batches(derive, batch_format="pyarrow")
        .groupby("surface_form")
        .aggregate(Min("doc_id", alias_name="min_doc_id"))
    )

    def finish(b: pa.Table) -> pa.Table:
        ids = b["min_doc_id"].to_pylist()
        return pa.table(
            {
                "surface_form": b["surface_form"],
                "entity_iri": pa.array([entity_iri(i) for i in ids], pa.string()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


class EntityLinker:
    """Actor-pool stage: triples batch in → link triples out.

    ``candidates_ref`` is a ``ray.put`` handle of a dict
    ``{surface_form: entity_iri}`` — resolved once in ``__init__``
    (zero-copy from the local object store on every node that runs an
    actor), the T2 broadcast pattern.
    """

    def __init__(
        self,
        candidates_ref,
        mention_pred: str,
        link_pred: str = DEFAULT_LINK_PRED,
    ):
        import ray

        self.cand = (
            candidates_ref
            if isinstance(candidates_ref, dict)
            else ray.get(candidates_ref)
        )
        self.mention_pred = mention_pred
        self.link_pred = link_pred

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["pred_value"], self.mention_pred),
            pc.equal(batch["obj_kind"], KIND_LITERAL),
        )
        mentions = batch.filter(mask)
        # vectorized dict lookup (pandas map) over the pre-filtered
        # mentions — no per-row Python
        import pandas as pd

        ent = pd.Series(mentions["obj_value"].to_pylist(), dtype=object).map(
            self.cand
        )
        keep = ent.notna().to_numpy()
        kept = mentions.filter(pa.array(keep))
        entity = ent[keep].tolist()
        n = kept.num_rows
        return pa.table(
            {
                "subj_kind": pc.cast(kept["subj_kind"], pa.uint8()),
                "subj_value": pc.cast(kept["subj_value"], pa.large_string()),
                "subj_lang": pa.array([""] * n, pa.string()),
                "subj_datatype": pa.array([""] * n, pa.string()),
                "pred_kind": pa.array([KIND_IRI] * n, pa.uint8()),
                "pred_value": pa.array([self.link_pred] * n, pa.large_string()),
                "pred_lang": pa.array([""] * n, pa.string()),
                "pred_datatype": pa.array([""] * n, pa.string()),
                "obj_kind": pa.array([KIND_IRI] * n, pa.uint8()),
                "obj_value": pa.array(entity, pa.large_string()),
                "obj_lang": pa.array([""] * n, pa.string()),
                "obj_datatype": pa.array([""] * n, pa.string()),
            }
        )


def link_entities(
    triples_ds,
    candidates,
    mention_pred: str,
    link_pred: str = DEFAULT_LINK_PRED,
    concurrency: int = 2,
):
    """Broadcast path: ``candidates`` is a dict or a (small) candidates
    Dataset; shipped once via ``ray.put``, read per actor."""
    import ray

    if not isinstance(candidates, dict):
        candidates = {
            r["surface_form"]: r["entity_iri"] for r in candidates.take_all()
        }
    ref = ray.put(candidates)
    return triples_ds.map_batches(
        EntityLinker,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={
            "candidates_ref": ref,
            "mention_pred": mention_pred,
            "link_pred": link_pred,
        },
    )


def link_entities_join(
    triples_ds,
    candidates_ds,
    mention_pred: str,
    link_pred: str = DEFAULT_LINK_PRED,
    num_partitions: int | None = None,
):
    """Scale path: distributed hash join of mentions against candidate
    partitions — the per-partition candidate dictionary (each join
    partition holds only its hash range of the catalog).
    ``num_partitions`` defaults to ``io.shuffle_partitions()``."""
    if num_partitions is None:
        from ..io import shuffle_partitions

        num_partitions = shuffle_partitions()

    def mentions(b: pa.Table) -> pa.Table:
        m = b.filter(
            pc.and_(
                pc.equal(b["pred_value"], mention_pred),
                pc.equal(b["obj_kind"], KIND_LITERAL),
            )
        )
        return pa.table(
            {
                "subj_kind": m["subj_kind"],
                "subj_value": pc.cast(m["subj_value"], pa.string()),
                "surface_form": pc.cast(m["obj_value"], pa.string()),
            }
        )

    m_ds = triples_ds.map_batches(mentions, batch_format="pyarrow")
    joined = m_ds.join(
        candidates_ds,
        join_type="inner",
        on=("surface_form",),
        num_partitions=num_partitions,
    )

    def emit(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "subj_kind": pc.cast(b["subj_kind"], pa.uint8()),
                "subj_value": pc.cast(b["subj_value"], pa.large_string()),
                "subj_lang": pa.array([""] * n, pa.string()),
                "subj_datatype": pa.array([""] * n, pa.string()),
                "pred_kind": pa.array([KIND_IRI] * n, pa.uint8()),
                "pred_value": pa.array([link_pred] * n, pa.large_string()),
                "pred_lang": pa.array([""] * n, pa.string()),
                "pred_datatype": pa.array([""] * n, pa.string()),
                "obj_kind": pa.array([KIND_IRI] * n, pa.uint8()),
                "obj_value": pc.cast(b["entity_iri"], pa.large_string()),
                "obj_lang": pa.array([""] * n, pa.string()),
                "obj_datatype": pa.array([""] * n, pa.string()),
            }
        )

    return joined.map_batches(emit, batch_format="pyarrow")
