"""HTML5 microdata extractor (sources/microdata.py)."""

import pyarrow as pa

from argo_ray.sources.microdata import (
    RDF_TYPE,
    extract_microdata,
    extract_microdata_batch,
)
from argo_ray.terms import KIND_BLANK, KIND_IRI, KIND_LITERAL


def _spo(triples):
    return {(s.kind, s.value, p.value, o.kind, o.value) for s, p, o in triples}


def test_itemid_itemtype_and_value_priority():
    html = (
        '<div itemscope itemtype="https://schema.org/Book" itemid="https://x/b1">'
        '<span itemprop="name" content="from-content">ignored text</span>'
        '<a itemprop="https://schema.org/url" href="https://x/page">link</a>'
        '<span itemprop="about">text value</span>'
        "</div>"
    )
    got = _spo(extract_microdata(html, "https://src/1"))
    assert (0, "https://x/b1", RDF_TYPE, 0, "https://schema.org/Book") in got
    # content beats text; relative prop resolves against the type namespace
    assert (0, "https://x/b1", "https://schema.org/name", 2, "from-content") in got
    assert (0, "https://x/b1", "https://schema.org/url", 0, "https://x/page") in got
    assert (0, "https://x/b1", "https://schema.org/about", 2, "text value") in got
    assert len(got) == 4


def test_nested_anonymous_item_skolemized():
    html = (
        '<div itemscope itemtype="https://s/T" itemid="https://x/a">'
        '<div itemprop="part" itemscope>'
        '<span itemprop="https://s/name">inner</span>'
        "</div>"
        '<span itemprop="after">outer text</span>'
        "</div>"
    )
    triples = extract_microdata(html, "https://src/2")
    got = _spo(triples)
    blanks = {v for k, v, *_ in got if k == KIND_BLANK} | {
        v for *_, k, v in got if k == KIND_BLANK
    }
    assert len(blanks) == 1
    b = next(iter(blanks))
    assert b.startswith("mdanon")
    assert (0, "https://x/a", "https://s/part", 1, b) in got
    assert (1, b, "https://s/name", 2, "inner") in got
    # after the nested item closes, props attach to the OUTER item again
    assert (0, "https://x/a", "https://s/after", 2, "outer text") in got
    # determinism: same page → same skolem
    assert _spo(extract_microdata(html, "https://src/2")) == got


def test_void_and_self_closing_tags_do_not_leak_scope():
    html = (
        '<div itemscope itemid="https://x/v" itemtype="https://s/T">'
        '<img itemprop="img" src="i.png">'
        '<meta itemprop="m" content="42">'
        '<span itemprop="s">ok</span>'
        "</div>"
    )
    got = _spo(extract_microdata(html, "u"))
    # img has neither content nor href → pending text = "" (next tag)
    assert (0, "https://x/v", "https://s/m", 2, "42") in got
    assert (0, "https://x/v", "https://s/s", 2, "ok") in got


def test_batch_quarantines_poison(ray_session=None):
    b = pa.table(
        {
            "url": pa.array(["https://ok/1", "https://bad/2", None], pa.string()),
            "html": pa.array(
                [
                    b'<div itemscope itemid="https://x/i" itemtype="https://s/T"></div>',
                    b"\xff\xfe\x00garbage",
                    None,
                ],
                pa.binary(),
            ),
        }
    )
    out = extract_microdata_batch(b)  # must not raise
    assert out.num_rows == 1
    assert out["subj_value"][0].as_py() == "https://x/i"


def test_no_microdata_yields_nothing():
    assert extract_microdata("<html><body><p>plain</p></body></html>", "u") == []
    # itemprop outside any itemscope is ignored
    assert extract_microdata('<span itemprop="x">v</span>', "u") == []


def test_jsonld_html_extraction_and_block_quarantine():
    from argo_ray.sources.jsonld_html import extract_jsonld, extract_jsonld_batch

    good = (
        '<script type="application/ld+json">'
        '{"@id": "https://x/e", "@type": ["https://s/T"],'
        ' "https://s/name": "n"}</script>'
    )
    poison = '<script type="application/ld+json">{"@id": "tru</script>'
    html = f"<html><head>{good}{poison}</head></html>"
    triples = extract_jsonld(html)
    got = _spo(triples)
    assert (0, "https://x/e", RDF_TYPE, 0, "https://s/T") in got
    assert (0, "https://x/e", "https://s/name", 2, "n") in got
    assert len(got) == 2  # the poison block contributed nothing

    b = pa.table(
        {
            "url": pa.array(["https://p/1", "https://p/2"], pa.string()),
            "html": pa.array([html.encode(), b"\xff\xfenot html"], pa.binary()),
        }
    )
    out = extract_jsonld_batch(b)
    assert out.num_rows == 2
