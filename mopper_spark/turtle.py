"""Minimal Turtle parser for RML mapping documents.

The reference translates RML (Turtle) mappings to AlgeMapLoom plans through
the external ``ltranslator`` crate (``/root/reference/src/lib.rs:234-242``,
``Cargo.toml:13-15``); this module is our from-scratch equivalent front-end.
It parses the Turtle *subset* that RML/R2RML mapping documents use —
prefix/base directives, IRIs, prefixed names, string literals, blank-node
property lists, predicate-object (``;``) and object (``,``) lists, and the
``a`` keyword — into an in-memory triple list.  It is NOT a general Turtle
implementation (no collections, no numeric bare literals); mapping documents
don't need those, and anything unsupported raises a clear error.

Terms are ``(kind, value)`` tuples with kind in ``{"iri", "lit", "bnode"}``
plus annotated literal kinds ``lit@<tag>`` / ``lit^^<datatype-iri>`` (the
engine's okind encoding, preserved for the Turtle writer round-trip).
"""

from __future__ import annotations

import re

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

Term = tuple[str, str]

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<iriref><[^<>"{}|^`\\\s]*>)
  | (?P<string3>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\")
  | (?P<string>"(?:[^"\\\n]|\\.)*")
  | (?P<prefix_decl>@prefix\b)
  | (?P<base_decl>@base\b)
  | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<dtype_sep>\^\^)
  | (?P<bnode_label>_:[\w.\-]+)
  | (?P<pname>(?:[A-Za-z_](?:[\w.\-]*[\w\-])?)?:(?:[\w\-%](?:[\w.\-%]*[\w\-%])?)?)
  | (?P<a_kw>\ba\b)
  | (?P<punct>[\[\];,.()])
    """,
    re.VERBOSE,
)

_STRING_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(raw: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(raw):
        ch = raw[i]
        if ch == "\\" and i + 1 < len(raw):
            nxt = raw[i + 1]
            if nxt in _STRING_ESCAPES:
                out.append(_STRING_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "u" and i + 6 <= len(raw):
                out.append(chr(int(raw[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= len(raw):
                out.append(chr(int(raw[i + 2 : i + 10], 16)))
                i += 10
                continue
        out.append(ch)
        i += 1
    return "".join(out)


class TurtleParseError(ValueError):
    pass


class _Tokens:
    def __init__(self, text: str):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if m is None:
                snippet = text[pos : pos + 30]
                raise TurtleParseError(f"Unrecognized Turtle at: {snippet!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            self.toks.append((kind, m.group()))
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        tok = self.peek()
        if tok is None:
            raise TurtleParseError("Unexpected end of document")
        self.i += 1
        return tok

    def expect(self, kind: str, value: str | None = None) -> tuple[str, str]:
        tok = self.next()
        if tok[0] != kind or (value is not None and tok[1] != value):
            raise TurtleParseError(f"Expected {value or kind}, got {tok[1]!r}")
        return tok


class TurtleDocument:
    """Parsed document: triples + a couple of graph-query helpers."""

    def __init__(self, triples: list[tuple[Term, str, Term]], base: str | None):
        self.triples = triples
        self.base = base
        self._by_sp: dict[tuple[Term, str], list[Term]] = {}
        for s, p, o in triples:
            self._by_sp.setdefault((s, p), []).append(o)

    def objects(self, s: Term, p: str) -> list[Term]:
        return self._by_sp.get((s, p), [])

    def value(self, s: Term, p: str) -> Term | None:
        objs = self.objects(s, p)
        return objs[0] if objs else None

    def subjects_with(self, p: str) -> list[Term]:
        seen: dict[Term, None] = {}
        for s, pred, _ in self.triples:
            if pred == p:
                seen.setdefault(s)
        return list(seen)


class TurtleParser:
    def __init__(self, text: str):
        self.tokens = _Tokens(text)
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self.triples: list[tuple[Term, str, Term]] = []
        self._bnode_n = 0

    # -- term construction ------------------------------------------------
    def _resolve_iri(self, raw: str) -> str:
        value = _unescape(raw[1:-1])
        if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", value):
            return value
        if self.base is None:
            return value
        # mapping-document relative refs are simple suffixes of a '/' or
        # '#'-terminated base; full RFC 3986 merge is not needed here
        if value.startswith("#") or self.base.endswith(("/", "#")):
            return self.base + value
        return self.base.rsplit("/", 1)[0] + "/" + value

    def _expand_pname(self, raw: str) -> str:
        pfx, _, local = raw.partition(":")
        if pfx not in self.prefixes:
            raise TurtleParseError(f"Undefined prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def _new_bnode(self) -> Term:
        self._bnode_n += 1
        return ("bnode", f"b{self._bnode_n}")

    # -- grammar ----------------------------------------------------------
    def parse(self) -> TurtleDocument:
        while self.tokens.peek() is not None:
            kind, _ = self.tokens.peek()
            if kind == "prefix_decl":
                self.tokens.next()
                pname = self.tokens.expect("pname")[1]
                iri = self.tokens.expect("iriref")[1]
                self.tokens.expect("punct", ".")
                self.prefixes[pname[:-1]] = _unescape(iri[1:-1])
            elif kind == "base_decl":
                self.tokens.next()
                iri = self.tokens.expect("iriref")[1]
                self.tokens.expect("punct", ".")
                self.base = _unescape(iri[1:-1])
            else:
                self._triples_stmt()
        return TurtleDocument(self.triples, self.base)

    def _triples_stmt(self) -> None:
        subject = self._subject()
        self._predicate_object_list(subject)
        self.tokens.expect("punct", ".")

    def _subject(self) -> Term:
        kind, value = self.tokens.next()
        if kind == "iriref":
            return ("iri", self._resolve_iri(value))
        if kind == "pname":
            return ("iri", self._expand_pname(value))
        if kind == "bnode_label":
            return ("bnode", value[2:])
        if kind == "punct" and value == "[":
            node = self._new_bnode()
            if not (self.tokens.peek() == ("punct", "]")):
                self._predicate_object_list(node)
            self.tokens.expect("punct", "]")
            return node
        raise TurtleParseError(f"Bad subject token {value!r}")

    def _predicate_object_list(self, subject: Term) -> None:
        while True:
            tok = self.tokens.peek()
            if tok is None or tok == ("punct", "]") or tok == ("punct", "."):
                return
            predicate = self._verb()
            self._object_list(subject, predicate)
            tok = self.tokens.peek()
            if tok == ("punct", ";"):
                self.tokens.next()
                continue  # trailing ';' before '.' / ']' is legal
            return

    def _verb(self) -> str:
        kind, value = self.tokens.next()
        if kind == "a_kw":
            return RDF_TYPE
        if kind == "iriref":
            return self._resolve_iri(value)
        if kind == "pname":
            return self._expand_pname(value)
        raise TurtleParseError(f"Bad predicate token {value!r}")

    def _object_list(self, subject: Term, predicate: str) -> None:
        while True:
            obj = self._object()
            self.triples.append((subject, predicate, obj))
            if self.tokens.peek() == ("punct", ","):
                self.tokens.next()
                continue
            return

    def _object(self) -> Term:
        kind, value = self.tokens.next()
        if kind == "iriref":
            return ("iri", self._resolve_iri(value))
        if kind == "pname":
            return ("iri", self._expand_pname(value))
        if kind == "bnode_label":
            return ("bnode", value[2:])
        if kind in ("string", "string3"):
            raw = value[3:-3] if kind == "string3" else value[1:-1]
            # language tags / datatypes are PRESERVED in the kind, using
            # the engine's okind encoding ('lit@en', 'lit^^<dt-iri>'
            # without the brackets) — mapping-document consumers only ever
            # test kind == "iri", so they are unaffected, and the Turtle
            # writer round-trip (ntriples.format_turtle) is lossless.
            # The reference itself drops annotations
            # (src/function/literal.rs:36-37 TODO).
            nxt = self.tokens.peek()
            if nxt is not None and nxt[0] == "langtag":
                tag = self.tokens.next()[1]
                return (f"lit@{tag[1:]}", _unescape(raw))
            if nxt is not None and nxt[0] == "dtype_sep":
                self.tokens.next()
                dk, dv = self.tokens.next()  # the datatype IRI/pname
                if dk == "iriref":
                    dt = self._resolve_iri(dv)
                elif dk == "pname":
                    dt = self._expand_pname(dv)
                else:
                    raise TurtleParseError(f"Bad datatype token {dv!r}")
                return (f"lit^^{dt}", _unescape(raw))
            return ("lit", _unescape(raw))
        if kind == "punct" and value == "[":
            node = self._new_bnode()
            if not (self.tokens.peek() == ("punct", "]")):
                self._predicate_object_list(node)
            self.tokens.expect("punct", "]")
            return node
        raise TurtleParseError(f"Bad object token {value!r}")


def parse_turtle(text: str) -> TurtleDocument:
    return TurtleParser(text).parse()
