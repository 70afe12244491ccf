"""Minimal Turtle parser for R2RML mapping documents (SURVEY.md M3).

The reference parses mapping graphs with ``RDF::Trine::Parser::Turtle``
(anchor: ``lib/RDF/RDB2RDF/R2RML.pm::new``). rdflib is not available in this
sandbox, so this vendors the Turtle *subset* every real R2RML mapping uses:

  @prefix/@base (and SPARQL-style PREFIX/BASE), semicolon/comma predicate
  and object lists, anonymous blank-node property lists ``[ ... ]``,
  labeled blank nodes ``_:x``, IRIs ``<...>``, prefixed names, the ``a``
  keyword, string literals (single/double/long quotes, ``\\`` escapes,
  ``@lang``, ``^^datatype``), integer/decimal/boolean shorthand, comments.

Mapping documents are driver-side and tiny (KBs), so a straightforward
recursive-descent parser is the right tool — parsing never touches executors.

Output: list of triples; each term is a tuple
  ('iri', value) | ('blank', label) | ('literal', value, datatype, lang)
"""

from __future__ import annotations

import re
from typing import Iterator

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"

Term = tuple
Triple = tuple  # (s, p, o)

_TOKEN = re.compile(
    r"""
    (?P<longstr>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<string>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<comment>\#[^\n]*)
  | (?P<prefix_decl>@prefix\b|@base\b|PREFIX\b|BASE\b)
  | (?P<lang>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<dtsep>\^\^)
  | (?P<punct>[;,.\[\]()])
  | (?P<number>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<bnode>_:[\w-]+)
    # pname/colononly MUST precede the bare keywords: 'a:b' is a prefixed
    # name, not the 'a' keyword; 'true:x' is a prefixed name, not a boolean
  | (?P<pname>[A-Za-z_][\w.-]*?:[\w.%-]*(?<![.;,]))
  | (?P<colononly>:[\w.%-]*(?<![.;,]))
  | (?P<bool>\btrue\b|\bfalse\b)
  | (?P<a>\ba\b)
  | (?P<ws>\s+)
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t",
    "n": "\n",
    "r": "\r",
    "b": "\b",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n in _ESCAPES:
                out.append(_ESCAPES[n])
                i += 2
                continue
            if n == "u":
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if n == "U":
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


class TurtleParser:
    def __init__(self, text: str, base: str = ""):
        self.tokens = self._tokenize(text)
        self.pos = 0
        self.prefixes: dict[str, str] = {}
        self.base = base
        self.triples: list[Triple] = []
        self._bnode_n = 0

    # -- tokenizing --
    def _tokenize(self, text: str) -> list[tuple[str, str]]:
        toks = []
        i = 0
        while i < len(text):
            m = _TOKEN.match(text, i)
            if not m:
                raise ValueError(f"turtle: bad token at {text[i:i+30]!r}")
            kind = m.lastgroup
            val = m.group()
            i = m.end()
            if kind in ("ws", "comment"):
                continue
            toks.append((kind, val))
        return toks

    def _peek(self) -> tuple[str, str] | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def _next(self) -> tuple[str, str]:
        if self.pos >= len(self.tokens):
            raise ValueError("turtle: unexpected end of input")
        t = self.tokens[self.pos]
        self.pos += 1
        return t

    def _expect_punct(self, ch: str) -> None:
        k, v = self._next()
        if k != "punct" or v != ch:
            raise ValueError(f"turtle: expected {ch!r} got {v!r}")

    def _fresh_bnode(self) -> Term:
        self._bnode_n += 1
        return ("blank", f"genid{self._bnode_n}")

    # -- grammar --
    def parse(self) -> list[Triple]:
        while self._peek():
            k, v = self._peek()
            if k == "prefix_decl":
                self._directive()
            else:
                self._triples_block()
        return self.triples

    def _directive(self) -> None:
        _, v = self._next()
        sparql_style = v in ("PREFIX", "BASE")
        if v in ("@prefix", "PREFIX"):
            k, p = self._next()
            if k == "pname" or k == "colononly":
                prefix = p[: p.index(":")]
            else:
                raise ValueError(f"turtle: bad prefix name {p!r}")
            k, iri = self._next()
            if k != "iri":
                raise ValueError("turtle: @prefix needs an IRI")
            self.prefixes[prefix] = self._resolve(iri[1:-1])
        else:  # @base / BASE
            k, iri = self._next()
            if k != "iri":
                raise ValueError("turtle: @base needs an IRI")
            self.base = self._resolve(iri[1:-1])
        if not sparql_style:
            self._expect_punct(".")

    def _triples_block(self) -> None:
        s = self._node(subject=True)
        self._predicate_object_list(s)
        self._expect_punct(".")

    def _predicate_object_list(self, s: Term) -> None:
        while True:
            p = self._verb()
            self._object_list(s, p)
            nxt = self._peek()
            if nxt and nxt == ("punct", ";"):
                self._next()
                # tolerate trailing ';' before '.' or ']'
                nxt2 = self._peek()
                if nxt2 and nxt2[0] == "punct" and nxt2[1] in ".]":
                    return
                continue
            return

    def _verb(self) -> Term:
        if self._peek() is None:
            raise ValueError("turtle: unexpected end of input")
        k, v = self._peek()
        if k == "a":
            self._next()
            return ("iri", RDF_TYPE)
        return self._node()

    def _object_list(self, s: Term, p: Term) -> None:
        while True:
            o = self._node()
            self.triples.append((s, p, o))
            if self._peek() == ("punct", ","):
                self._next()
                continue
            return

    def _node(self, subject: bool = False) -> Term:
        k, v = self._next()
        if k == "iri":
            return ("iri", self._resolve(_unescape(v[1:-1])))
        if k in ("pname", "colononly"):
            prefix, local = v.split(":", 1)
            if prefix not in self.prefixes:
                raise ValueError(f"turtle: undeclared prefix {prefix!r}:")
            return ("iri", self.prefixes[prefix] + local)
        if k == "bnode":
            return ("blank", v[2:])
        if k == "punct" and v == "[":
            b = self._fresh_bnode()
            if self._peek() == ("punct", "]"):
                self._next()
                return b
            self._predicate_object_list(b)
            self._expect_punct("]")
            return b
        if k == "punct" and v == "(":
            return self._collection()
        if k in ("string", "longstr"):
            q = 3 if k == "longstr" else 1
            value = _unescape(v[q:-q])
            nxt = self._peek()
            if nxt and nxt[0] == "lang":
                self._next()
                return ("literal", value, None, nxt[1][1:].lower())
            if nxt and nxt[0] == "dtsep":
                self._next()
                dt = self._node()
                return ("literal", value, dt[1], None)
            return ("literal", value, None, None)
        if k == "number":
            if re.fullmatch(r"[+-]?\d+", v):
                return ("literal", v, "http://www.w3.org/2001/XMLSchema#integer", None)
            if "e" in v.lower():
                return ("literal", v, "http://www.w3.org/2001/XMLSchema#double", None)
            return ("literal", v, "http://www.w3.org/2001/XMLSchema#decimal", None)
        if k == "bool":
            return ("literal", v, "http://www.w3.org/2001/XMLSchema#boolean", None)
        raise ValueError(f"turtle: unexpected token {v!r}")

    def _collection(self) -> Term:
        items = []
        while self._peek() != ("punct", ")"):
            items.append(self._node())
        self._next()
        if not items:
            return ("iri", RDF_NIL)
        head = self._fresh_bnode()
        cur = head
        for i, item in enumerate(items):
            self.triples.append((cur, ("iri", RDF_FIRST), item))
            if i + 1 < len(items):
                nxt = self._fresh_bnode()
                self.triples.append((cur, ("iri", RDF_REST), nxt))
                cur = nxt
            else:
                self.triples.append((cur, ("iri", RDF_REST), ("iri", RDF_NIL)))
        return head

    def _resolve(self, iri: str) -> str:
        if "://" in iri or iri.startswith("urn:") or not self.base:
            return iri
        if iri.startswith("#") or not iri:
            return self.base.split("#")[0] + iri
        # simple relative resolution (enough for mapping docs)
        if iri.startswith("/"):
            m = re.match(r"^([a-z]+://[^/]+)", self.base)
            return (m.group(1) if m else self.base) + iri
        return self.base.rsplit("/", 1)[0] + "/" + iri


def parse_turtle(text: str, base: str = "") -> list[Triple]:
    return TurtleParser(text, base=base).parse()


class Graph:
    """Tiny driver-side triple store with the lookups the R2RML compiler
    needs (subjects-by-type, objects-of, etc.)."""

    def __init__(self, triples: list[Triple]):
        self.triples = triples
        self._spo: dict[Term, dict[str, list[Term]]] = {}
        for s, p, o in triples:
            self._spo.setdefault(s, {}).setdefault(p[1], []).append(o)

    def objects(self, s: Term, p_iri: str) -> list[Term]:
        return self._spo.get(s, {}).get(p_iri, [])

    def object(self, s: Term, p_iri: str) -> Term | None:
        objs = self.objects(s, p_iri)
        return objs[0] if objs else None

    def value(self, s: Term, p_iri: str) -> str | None:
        o = self.object(s, p_iri)
        return o[1] if o else None

    def subjects_with(self, p_iri: str, o: Term | None = None) -> list[Term]:
        out = []
        for s, props in self._spo.items():
            for oo in props.get(p_iri, []):
                if o is None or oo == o:
                    out.append(s)
                    break
        return out

    def subjects(self) -> Iterator[Term]:
        return iter(self._spo)
