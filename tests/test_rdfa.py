"""RDFa/HTML extractor conformance — one case per attribute rule of the
reference traversal (``/root/reference/rdfaparser/rdfaparser.go:64-151``),
plus the synthetic pages fixture (text invariant + expected triples)."""

import pyarrow as pa

from argo_ray import pages as pg
from argo_ray.sources.rdfa import (
    extract_rdfa,
    extract_rdfa_batch,
    extract_text,
    skolem_id,
)
from argo_ray.terms import A, IRI, Blank, Literal

DOC = "http://doc.example.org/"


def test_typeof_with_resource():
    html = '<div xmlns:ex="http://ex.org/" typeof="ex:Thing" resource="http://e.org/x"></div>'
    assert extract_rdfa(html, DOC) == [
        (IRI("http://e.org/x"), A, IRI("http://ex.org/Thing"))
    ]


def test_typeof_without_resource_is_skolemized_bnode():
    html = '<div xmlns:ex="http://ex.org/" typeof="ex:Thing"></div>'
    b = Blank(skolem_id(DOC, 0))
    assert extract_rdfa(html, DOC) == [(b, A, IRI("http://ex.org/Thing"))]
    # deterministic across calls
    assert extract_rdfa(html, DOC) == extract_rdfa(html, DOC)


def test_property_content():
    html = '<span xmlns:ex="http://ex.org/" property="ex:name" content="Alice"></span>'
    assert extract_rdfa(html, DOC) == [
        (IRI(DOC), IRI("http://ex.org/name"), Literal("Alice"))
    ]


def test_property_child_text():
    html = '<span xmlns:ex="http://ex.org/" property="ex:name">Bob</span>'
    assert extract_rdfa(html, DOC) == [
        (IRI(DOC), IRI("http://ex.org/name"), Literal("Bob"))
    ]


def test_property_empty_without_children():
    html = '<span xmlns:ex="http://ex.org/" property="ex:name"></span>'
    assert extract_rdfa(html, DOC) == [
        (IRI(DOC), IRI("http://ex.org/name"), Literal(""))
    ]


def test_property_datatype():
    html = '<span xmlns:ex="http://ex.org/" property="ex:n" content="4" datatype="http://www.w3.org/2001/XMLSchema#integer"></span>'
    assert extract_rdfa(html, DOC) == [
        (
            IRI(DOC),
            IRI("http://ex.org/n"),
            Literal("4", datatype="http://www.w3.org/2001/XMLSchema#integer"),
        )
    ]


def test_property_xml_lang():
    html = '<span xmlns:ex="http://ex.org/" property="ex:t" xml:lang="fr">chat</span>'
    assert extract_rdfa(html, DOC) == [
        (IRI(DOC), IRI("http://ex.org/t"), Literal("chat", lang="fr"))
    ]


def test_rel_href_and_rev_href():
    html = (
        '<div xmlns:ex="http://ex.org/">'
        '<a rel="ex:knows" href="http://e.org/y">y</a>'
        '<a rev="ex:cites" href="http://e.org/z">z</a></div>'
    )
    assert extract_rdfa(html, DOC) == [
        (IRI(DOC), IRI("http://ex.org/knows"), IRI("http://e.org/y")),
        (IRI("http://e.org/z"), IRI("http://ex.org/cites"), IRI(DOC)),
    ]


def test_vocab_expansion_bare_name():
    html = '<div vocab="http://v.org/"><span property="name" content="n"></span></div>'
    assert extract_rdfa(html, DOC) == [
        (IRI(DOC), IRI("http://v.org/name"), Literal("n"))
    ]


def test_vocab_scoped_to_subtree():
    # vocab is passed by value in the reference traversal → resets after
    # the subtree; xmlns prefixes persist (shared map).
    html = (
        '<div vocab="http://v.org/"><span property="a" content="1"></span></div>'
        '<span property="b" content="2"></span>'
    )
    triples = extract_rdfa(html, DOC)
    assert triples[0][1] == IRI("http://v.org/a")
    assert triples[1][1] == IRI("b")  # no vocab in scope → "" + "b"


def test_prefix_persists_across_siblings():
    html = (
        '<div xmlns:ex="http://ex.org/"></div>'
        '<span property="ex:p" content="v"></span>'
    )
    assert extract_rdfa(html, DOC) == [
        (IRI(DOC), IRI("http://ex.org/p"), Literal("v"))
    ]


def test_subject_scoping_nested():
    html = (
        '<div xmlns:ex="http://ex.org/" typeof="ex:T" resource="http://e.org/x">'
        '<span property="ex:p" content="v"></span></div>'
        '<span property="ex:q" content="w"></span>'
    )
    triples = extract_rdfa(html, DOC)
    assert triples[1][0] == IRI("http://e.org/x")  # inside: new subject
    assert triples[2][0] == IRI(DOC)  # outside: back to document


def test_leading_xml_declaration_skipped():
    html = '<?xml version="1.0"?><div xmlns:ex="http://ex.org/" property="ex:p" content="v"></div>'
    assert extract_rdfa(html, DOC) == [
        (IRI(DOC), IRI("http://ex.org/p"), Literal("v"))
    ]


def test_unknown_prefix_maps_to_empty_base():
    html = '<span property="nope:p" content="v"></span>'
    assert extract_rdfa(html, DOC) == [(IRI(DOC), IRI("p"), Literal("v"))]


# ---------------------------------------------------------------------------
# Synthetic pages fixture
# ---------------------------------------------------------------------------


def _page_row(doc_id=3, text="alpha beta gamma delta epsilon zeta", lang="en",
              source="src1", n_chars=35):
    return doc_id, text, lang, source, n_chars


def test_pages_text_invariant():
    doc_id, text, lang, source, n_chars = _page_row()
    html = pg.build_html(doc_id, text, lang, source, n_chars)
    assert extract_text(html) == pg.expected_text(doc_id, text)


def test_pages_expected_triples():
    doc_id, text, lang, source, n_chars = _page_row()  # doc_id=3 → dup branch
    html = pg.build_html(doc_id, text, lang, source, n_chars)
    url = pg.page_url(source, doc_id)
    entity = IRI(pg.entity_iri(doc_id))
    title = pg.title_of(text)
    triples = extract_rdfa(html, url)
    assert (entity, A, IRI(pg.EX_NS + "Document")) in triples
    lang_triple = (entity, IRI(pg.DC_NS + "language"), Literal(lang))
    assert triples.count(lang_triple) == 2  # duplicate assertion
    assert (
        entity,
        IRI(pg.EX_NS + "chars"),
        Literal(str(n_chars), datatype=pg.XSD_INTEGER),
    ) in triples
    assert (entity, IRI(pg.DC_NS + "title"), Literal(title, lang=lang)) in triples
    assert (entity, IRI(pg.EX_NS + "site"), IRI(pg.site_iri(doc_id))) in triples
    assert (IRI(pg.HUB_IRI), IRI(pg.EX_NS + "cites"), entity) in triples


def test_pages_bnode_branch():
    doc_id, text, lang, source, n_chars = 7, "a b c d e f", "de", "src0", 11
    html = pg.build_html(doc_id, text, lang, source, n_chars)
    url = pg.page_url(source, doc_id)
    triples = extract_rdfa(html, url)
    b = Blank(skolem_id(url, 0))
    assert (b, A, IRI(pg.EX_NS + "Mention")) in triples
    assert (b, IRI(pg.EX_NS + "label"), Literal(f"m{doc_id}")) in triples


def test_extract_batch():
    rows = [_page_row(i, "w1 w2 w3 w4 w5 w6", "en", "srcX", 10) for i in range(20)]
    batch = pa.table(
        {
            "url": [pg.page_url(r[3], r[0]) for r in rows],
            "html": [pg.build_html(*r).encode() for r in rows],
        }
    )
    out = extract_rdfa_batch(batch)
    assert out.num_rows > 6 * 20
    assert "subject_hash" in out.column_names
    assert out["subj_kind"].type == pa.uint8()


def test_poison_page_quarantine():
    """Poison pages: extraction skips, the errors side-channel records."""
    import pyarrow as pa

    from argo_ray.sources.rdfa import extract_errors_batch, extract_rdfa_batch

    bad = pa.table(
        {
            "url": pa.array(
                ["http://x/ok", "http://x/null", "http://x/garbage", "http://x/trunc"],
                pa.string(),
            ),
            "html": pa.array(
                [b"<div property='p' vocab='v'>fine</div>", None,
                 b"\xff\xfe\x00garbage", b"<div property="],
                pa.binary(),
            ),
        }
    )
    out = extract_rdfa_batch(bad)
    assert out.num_rows == 1  # only the good page emits
    errs = extract_errors_batch(bad)
    assert "http://x/null" in errs["url"].to_pylist()
    assert set(errs.column_names) == {"url", "error_kind", "error"}


def test_non_rdfa_page_fast_exit():
    """Pages without any RDFa marker emit nothing (and take the O(1)
    pre-scan exit); markers hidden in text still parse correctly."""
    from argo_ray.sources.rdfa import extract_rdfa

    plain = "<html><body><p>just text</p><a href='x'>link</a></body></html>"
    assert extract_rdfa(plain, "http://e/1") == []
    # 'rel' appears only inside visible text → slow path, still no triples
    tricky = "<html><body><p>barrel of text</p></body></html>"
    assert extract_rdfa(tricky, "http://e/2") == []
    marked = "<div property='p' vocab='v'>v</div>"
    assert len(extract_rdfa(marked, "http://e/3")) == 1


def test_uppercase_attributes_match_fallback():
    """RDFa attribute names are case-insensitive (html.parser lowercases
    them per spec); the fast-path pre-scan/hint must not drop
    PROPERTY=/TYPEOF= pages (ADVICE r1: case-sensitive hint silently
    returned [])."""
    from argo_ray.sources.rdfa import _RdfaEvents, extract_rdfa

    pages = [
        '<div PROPERTY="dc:title" xmlns:dc="http://p/">T</div>',
        '<div TYPEOF="dc:Thing" xmlns:dc="http://p/">x</div>',
        '<div Rel="dc:link" Href="http://o/" xmlns:dc="http://p/"></div>',
        '<span Vocab="http://v/" property="name">n</span>',
    ]
    for html in pages:
        got = extract_rdfa(html, "http://u/")
        p = _RdfaEvents("http://u/")
        p.feed(html)
        p.close()
        if p.pending is not None:
            p._flush_pending("")
        assert got == p.triples and len(got) == 1, html


def test_script_heavy_page_no_quadratic_copy():
    """Raw-text close-tag search must not copy/lowercase the whole page
    per <script>; also uppercase </SCRIPT> closes correctly."""
    from argo_ray.sources.rdfa import extract_rdfa

    html = (
        "<html><body>"
        + "<script>var a='<div property=no>';</script>" * 50
        + "<SCRIPT>x</SCRIPT>"
        + '<div property="p" vocab="http://v/">val</div></body></html>'
    )
    out = extract_rdfa(html, "http://u/")
    assert len(out) == 1 and out[0][2].value == "val"
