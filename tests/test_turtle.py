"""Table-driven Turtle parser suite (the round-trip partner of sink K4;
the reference ships no Turtle parser — rendering rules per
/root/reference/turtleserializer.go:11-82)."""

import pytest

from argo_ray.sources.turtle import TurtleParseError, parse_turtle
from argo_ray.terms import Blank, IRI, Literal

EX = "http://example.org/ns#"

POSITIVE = [
    # bare IRIs, one predicate
    (
        "<http://e/s>\n  <http://e/p> <http://e/o> ;\n  .\n",
        [(IRI("http://e/s"), IRI("http://e/p"), IRI("http://e/o"))],
    ),
    # @prefix + qname compaction on every position
    (
        f"@prefix ex: <{EX}> .\n\nex:s\n  ex:p ex:o ;\n  .\n",
        [(IRI(EX + "s"), IRI(EX + "p"), IRI(EX + "o"))],
    ),
    # blank-node subject and object
    (
        "_:b1\n  <http://e/p> _:b2 ;\n  .\n",
        [(Blank("b1"), IRI("http://e/p"), Blank("b2"))],
    ),
    # plain / lang / typed literals
    (
        '<http://e/s>\n  <http://e/p> "v" ;\n  <http://e/q> "sept"@fr ;\n'
        '  <http://e/r> "7"^^<http://www.w3.org/2001/XMLSchema#integer> ;\n  .\n',
        [
            (IRI("http://e/s"), IRI("http://e/p"), Literal("v")),
            (IRI("http://e/s"), IRI("http://e/q"), Literal("sept", lang="fr")),
            (
                IRI("http://e/s"),
                IRI("http://e/r"),
                Literal("7", datatype="http://www.w3.org/2001/XMLSchema#integer"),
            ),
        ],
    ),
    # escapes in literal values (N-Triples escaping rules, term.go:95-99)
    (
        '<http://e/s>\n  <http://e/p> "a\\"b\\\\c\\nd" ;\n  .\n',
        [(IRI("http://e/s"), IRI("http://e/p"), Literal('a"b\\c\nd'))],
    ),
    # qname datatype
    (
        f"@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n\n"
        '<http://e/s>\n  <http://e/p> "1"^^xsd:integer ;\n  .\n',
        [
            (
                IRI("http://e/s"),
                IRI("http://e/p"),
                Literal("1", datatype="http://www.w3.org/2001/XMLSchema#integer"),
            )
        ],
    ),
    # repeated subject blocks accumulate (salted-shuffle output shape)
    (
        "<http://e/s>\n  <http://e/p> <http://e/o1> ;\n  .\n\n"
        "<http://e/s>\n  <http://e/p> <http://e/o2> ;\n  .\n",
        [
            (IRI("http://e/s"), IRI("http://e/p"), IRI("http://e/o1")),
            (IRI("http://e/s"), IRI("http://e/p"), IRI("http://e/o2")),
        ],
    ),
    # empty document → empty graph
    ("", []),
]


@pytest.mark.parametrize("doc,expected", POSITIVE)
def test_turtle_positive(doc, expected):
    assert parse_turtle(doc) == expected


NEGATIVE = [
    "<http://e/s>\n  <http://e/p> ;\n  .\n",  # missing object
    "<http://e/s>\n  <http://e/p> <http://e/o>\n",  # unterminated block
    "ex:s\n  ex:p ex:o ;\n  .\n",  # qname with undeclared prefix
]


@pytest.mark.parametrize("doc", NEGATIVE)
def test_turtle_negative(doc):
    with pytest.raises(TurtleParseError):
        parse_turtle(doc)
