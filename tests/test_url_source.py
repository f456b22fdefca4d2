"""URL-backed source (reference ParseURL/ParseHTTP glue,
graph.go:313-335): file:// fetch, registry-driven format inference,
quarantine on fetch/parse failure."""

import pyarrow.compute as pc
import pytest

from argo_ray.sources.url import read_url, read_urls, resolve_format


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return p.as_uri()


def test_resolve_format_order():
    from argo_ray.sources.registry import FORMATS

    # explicit override wins over everything
    assert resolve_format("http://x/a.nt", "text/turtle", "rdfxml") is FORMATS["rdfxml"]
    # content-type beats extension (non-catch-all mime)
    assert resolve_format("http://x/a.nt", "text/turtle") is FORMATS["turtle"]
    # text/plain is urllib's catch-all guess → extension wins
    assert resolve_format("file:///x/a.ttl", "text/plain") is FORMATS["turtle"]
    # extension only (query string stripped)
    assert resolve_format("http://x/a.rdf?v=1") is FORMATS["rdfxml"]
    with pytest.raises(ValueError, match="cannot infer"):
        resolve_format("http://x/opaque")
    with pytest.raises(ValueError, match="unknown format"):
        resolve_format("http://x/a.nt", None, "nope")


def test_read_urls_file_scheme_multiformat(ray_session, tmp_path):
    """Two file:// URLs, formats inferred per URL from extension;
    triples fan in with null source_error."""
    ttl = _write(
        tmp_path, "a.ttl",
        "@prefix ex: <http://ex.org/> .\nex:s\n  ex:p ex:o ;\n  ex:q ex:o2 ;\n  .\n",
    )
    nt = _write(
        tmp_path, "b.nt",
        "<http://ex.org/s2> <http://ex.org/p> \"lit\" .\n",
    )
    out = read_urls([ttl, nt])
    tbl = out.to_pandas()
    assert len(tbl) == 3
    assert tbl["source_error"].isna().all()
    assert set(tbl["subj_value"]) == {"http://ex.org/s", "http://ex.org/s2"}


def test_read_urls_quarantines_bad_url(ray_session, tmp_path):
    """A missing file quarantines into the source_error channel; the
    good URL's triples still flow."""
    good = _write(tmp_path, "g.nt", "<http://e/s> <http://e/p> <http://e/o> .\n")
    bad = (tmp_path / "missing.nt").as_uri()
    out = read_urls([good, bad])
    ok = out.filter(lambda r: r["source_error"] is None)
    err = out.filter(lambda r: r["source_error"] is not None)
    assert ok.count() == 1
    err_rows = err.take_all()
    assert len(err_rows) == 1
    assert err_rows[0]["url"] == bad
    assert "Error" in err_rows[0]["source_error"]


def test_read_url_raises_and_salts_blank_nodes(ray_session, tmp_path):
    """read_url raises on failure; generated blank-node labels are
    salted with the URL so two documents' anonymous nodes never collide
    after fan-in (rdfxml parser takes the salt; N-Triples keeps
    document labels as-is, reference behavior)."""
    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns:ex="http://ex.org/">'
        '<rdf:Description><ex:p rdf:resource="http://e/o"/></rdf:Description>'
        "</rdf:RDF>"
    )
    u1 = _write(tmp_path, "one.rdf", doc)
    u2 = _write(tmp_path, "two.rdf", doc)
    merged = read_urls([u1, u2]).to_pandas()
    anon = merged[merged["subj_kind"] == 1]["subj_value"]
    assert len(set(anon)) == 2  # per-URL salt kept them distinct

    with pytest.raises(Exception):
        read_url((tmp_path / "absent.ttl").as_uri()).take_all()


def test_read_urls_format_override(ray_session, tmp_path):
    """Explicit format overrides the (wrong) extension."""
    u = _write(
        tmp_path, "data.txt",
        "@prefix ex: <http://ex.org/> .\nex:a\n  ex:b ex:c ;\n  .\n",
    )
    out = read_urls([u], format="turtle")
    got = out.take_all()
    assert len(got) == 1 and got[0]["pred_value"] == "http://ex.org/b"
