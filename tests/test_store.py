"""K7 dictionary-encoded Parquet triple store: encode/decode round-trip
preserves the triple set; term ids are deterministic across runs."""

import shutil

from argo_ray.pipelines.flagship import flagship
from argo_ray.sinks.parquet_store import decode_store, encode_store, write_store
from argo_ray.terms import TRIPLE_COLUMNS

SF = "/root/testdata/sf0.001"
OUT = "/tmp/argo_test_store"


def _triple_set(ds):
    return {
        tuple(r[c] for c in TRIPLE_COLUMNS)
        for r in ds.select_columns(TRIPLE_COLUMNS).take_all()
    }


def test_store_roundtrip(ray_session):
    shutil.rmtree(OUT, ignore_errors=True)
    src = flagship(SF)
    write_store(src, OUT)
    back = decode_store(OUT)
    assert _triple_set(back) == _triple_set(flagship(SF))


def test_term_ids_deterministic(ray_session):
    terms1, _ = encode_store(flagship(SF))
    terms2, _ = encode_store(flagship(SF))
    ids1 = sorted(r["term_id"] for r in terms1.take_all())
    ids2 = sorted(r["term_id"] for r in terms2.take_all())
    assert ids1 == ids2
    assert len(ids1) == len(set(ids1))  # distinct terms, distinct ids
