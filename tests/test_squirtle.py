"""Squirtle parser/serializer conformance (authored — the reference has
no squirtle tests; semantics from /root/reference/squirtleparser.y)."""

from collections import Counter

import pytest

from argo_ray.sinks.squirtle import serialize_squirtle
from argo_ray.sources.rdfa import skolem_id
from argo_ray.sources.squirtle import (
    SquirtleParseError,
    parse_squirtle,
    parse_squirtle_with_prefixes,
)
from argo_ray.terms import A, IRI, Blank, Literal, triples_to_table

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
EX = "http://example.org/ns#"


def test_name_decl_and_qname():
    doc = f'name <{EX}> as ex\nex:alice {{ ex:age 30 }}'
    triples = parse_squirtle(doc)
    assert triples == [
        (IRI(EX + "alice"), IRI(EX + "age"), Literal("30", datatype=XSD + "integer"))
    ]


def test_add_hash_semantics():
    # base without trailing #// gets one appended for qnames
    doc = 'name <http://e.org/base> as b\nb:x { a b:T }'
    triples = parse_squirtle(doc)
    assert triples[0][0] == IRI("http://e.org/base#x")
    assert triples[0][1] == A
    assert triples[0][2] == IRI("http://e.org/base#T")


def test_slash_name():
    doc = 'name <http://e.org/base/> as b\nb/sub/item { b:p "v" }'
    triples = parse_squirtle(doc)
    assert triples[0][0] == IRI("http://e.org/base/sub/item")


def test_builtin_namespace_fallback():
    # no name decl: foaf resolves from the builtin table
    doc = 'foaf:alice { foaf:name "Alice" }'
    triples = parse_squirtle(doc)
    assert triples[0][0] == IRI("http://xmlns.com/foaf/0.1/alice")


def test_literal_forms():
    doc = (
        f'name <{EX}> as ex\n'
        'ex:s { ex:a "plain"; ex:b "chat"@fr; ex:c "42"^^xsd:integer; '
        "ex:d 3.5; ex:e 1e3; ex:f true; ex:g false }"
    )
    # note: ';' is not squirtle syntax — predicates just follow each other
    doc = doc.replace(";", "")
    triples = parse_squirtle(doc)
    objs = [t[2] for t in triples]
    assert Literal("plain") in objs
    assert Literal("chat", lang="fr") in objs
    assert Literal("42", datatype=XSD + "integer") in objs
    assert Literal("3.5", datatype=XSD + "decimal") in objs
    assert Literal("1e3", datatype=XSD + "double") in objs
    assert Literal("true", datatype=XSD + "boolean") in objs
    assert Literal("false", datatype=XSD + "boolean") in objs


def test_object_list():
    doc = f'name <{EX}> as ex\nex:s {{ ex:p ex:o1, ex:o2, "lit" }}'
    triples = parse_squirtle(doc)
    assert len(triples) == 3
    assert {t[2] for t in triples} == {IRI(EX + "o1"), IRI(EX + "o2"), Literal("lit")}


def test_star_predicate_container():
    doc = f'name <{EX}> as ex\nex:s {{ * "first" * "second" * "third" }}'
    triples = parse_squirtle(doc)
    assert [t[1] for t in triples] == [IRI(RDF + "_1"), IRI(RDF + "_2"), IRI(RDF + "_3")]


def test_nested_description():
    doc = f'name <{EX}> as ex\nex:s {{ ex:child ex:c {{ ex:name "kid" }} }}'
    triples = parse_squirtle(doc)
    assert (IRI(EX + "c"), IRI(EX + "name"), Literal("kid")) in triples
    assert (IRI(EX + "s"), IRI(EX + "child"), IRI(EX + "c")) in triples


def test_anonymous_subject_skolemized():
    doc = f'name <{EX}> as ex\n{{ ex:p "v" }}'
    triples = parse_squirtle(doc, document_uri="http://d.org/1")
    assert triples[0][0] == Blank(skolem_id("http://d.org/1", 0))


def test_bnode_terms():
    doc = f'name <{EX}> as ex\n_:b1 {{ ex:p _:b2 }}'
    triples = parse_squirtle(doc)
    assert triples == [(Blank("b1"), IRI(EX + "p"), Blank("b2"))]


def test_template_definition_and_application():
    doc = (
        f"name <{EX}> as ex\n"
        "template Person(?name, ?age) {\n"
        "  a ex:Person\n"
        "  ex:name ?name\n"
        "  ex:age ?age\n"
        "}\n"
        'ex:alice is Person("Alice", 30)\n'
        'ex:bob new Person("Bob", 25)\n'
    )
    triples = parse_squirtle(doc)
    alice, bob = IRI(EX + "alice"), IRI(EX + "bob")
    assert (alice, A, IRI(EX + "Person")) in triples
    assert (alice, IRI(EX + "name"), Literal("Alice")) in triples
    assert (alice, IRI(EX + "age"), Literal("30", datatype=XSD + "integer")) in triples
    assert (bob, IRI(EX + "name"), Literal("Bob")) in triples
    assert len(triples) == 6


def test_template_wrong_arity_errors():
    doc = (
        f"name <{EX}> as ex\n"
        "template T(?x) { ex:p ?x }\n"
        "ex:s is T()\n"
    )
    with pytest.raises(SquirtleParseError, match="Wrong number of arguments"):
        parse_squirtle(doc)


def test_undefined_template_errors():
    with pytest.raises(SquirtleParseError, match="Undefined template"):
        parse_squirtle("x is Nope()")


def test_include_rejected():
    with pytest.raises(SquirtleParseError, match="include"):
        parse_squirtle('include "other.sqtl"')


def test_comments_ignored():
    doc = f'name <{EX}> as ex\n# a comment\nex:s {{ ex:p "v" }} # trailing'
    assert len(parse_squirtle(doc)) == 1


def test_serialize_roundtrip_with_inlining():
    triples = [
        (IRI(EX + "s"), IRI(EX + "child"), Blank("b1")),
        (Blank("b1"), IRI(EX + "name"), Literal("kid")),
        (IRI(EX + "other"), IRI(EX + "p"), Literal("x", lang="en")),
        (IRI(EX + "other"), IRI(EX + "n"), Literal("7", datatype=XSD + "integer")),
    ]
    table = triples_to_table(triples, with_hash=False)
    text = serialize_squirtle(table, {EX: "ex"})
    # inlined bnode description appears nested
    assert "_:b1 {" in text
    reparsed, prefixes = parse_squirtle_with_prefixes(text)
    assert Counter(reparsed) == Counter(triples)
    assert prefixes.get(EX) == "ex"


def test_serialize_roundtrip_no_prefixes():
    triples = [(IRI(EX + "s"), IRI(EX + "p"), IRI(EX + "o"))]
    table = triples_to_table(triples, with_hash=False)
    text = serialize_squirtle(table, {})
    assert Counter(parse_squirtle(text)) == Counter(triples)


class TestIncludeResolution:
    """Driver-side include pre-resolution (squirtleparser.y:101-136):
    recursive splice against a name→source map, shared declaration
    state across the boundary, cycle/unknown rejection."""

    def test_include_string_and_iri_forms(self):
        from argo_ray.sources.squirtle import parse_squirtle

        srcs = {
            "decls.sqtl": 'name <http://ex.org/> as ex\n',
            "http://ex.org/more.sqtl": '<http://s/2> { ex:p "two" }\n',
        }
        text = (
            'include "decls.sqtl"\n'
            '<http://s/1> { ex:p "one" }\n'
            "include <http://ex.org/more.sqtl>\n"
        )
        triples = parse_squirtle(text, includes=srcs)
        assert [(s.value, o.value) for s, _, o in triples] == [
            ("http://s/1", "one"), ("http://s/2", "two"),
        ]
        # prefix declared in the include resolves in BOTH documents
        assert all(p.value == "http://ex.org/p" for _, p, _ in triples)

    def test_nested_includes_and_templates_cross_boundary(self):
        from argo_ray.sources.squirtle import parse_squirtle

        srcs = {
            "a": 'include "b"\ntemplate T(?v) { <http://p/t> ?v }\n',
            "b": "name <http://base/> as b\n",
        }
        text = 'include "a"\n<http://s/x> is T("bound")\n'
        triples = parse_squirtle(text, includes=srcs)
        assert len(triples) == 1
        s, p, o = triples[0]
        assert (s.value, p.value, o.value) == ("http://s/x", "http://p/t", "bound")

    def test_include_inside_string_comment_iri_untouched(self):
        from argo_ray.sources.squirtle import parse_squirtle

        text = (
            "# include \"nope\"\n"
            '<http://s/1> { <http://p/1> "include \'x\'" }\n'
        )
        triples = parse_squirtle(text, includes={})
        assert len(triples) == 1 and triples[0][2].value == "include 'x'"

    def test_include_cycle_and_unknown_raise(self):
        import pytest

        from argo_ray.sources.squirtle import SquirtleParseError, resolve_includes

        with pytest.raises(SquirtleParseError, match="cycle"):
            resolve_includes('include "a"', {"a": 'include "b"', "b": 'include "a"'})
        with pytest.raises(SquirtleParseError, match="unknown include"):
            resolve_includes('include "missing"', {})

    def test_unresolved_include_still_rejected_in_parse(self):
        import pytest

        from argo_ray.sources.squirtle import SquirtleParseError, parse_squirtle

        with pytest.raises(SquirtleParseError, match="include"):
            parse_squirtle('include "x"')  # no map → distributed-parse error
