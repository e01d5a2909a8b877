"""ShExML mapping → AlgeMapLoom plan translator (pragmatic subset).

The reference accepts ShExML mapping documents through the same external
``ltranslator`` crate as RML (``/root/reference/src/lib.rs:234-242``,
``MappingLang::ShExML``); this module is our from-scratch equivalent for
the common CSV-backed subset of the language
(https://shexml.herminiogarcia.com/spec/):

- ``PREFIX pfx: <iri>``
- ``SOURCE name <file-or-url>``
- ``ITERATOR name csvperrow { FIELD f <column> ... }`` (csvperrow only —
  the reference engine itself executes only CSV rows, lib.rs:129-137)
- ``EXPRESSION name <source.iterator>`` and N-way
  ``<a.b UNION c.d [UNION …]>`` (each branch instantiates every shape
  that uses the expression — union-into-one-sink semantics)
- Shapes: ``:Name pfx:[expr.field] { pfx:p [expr.field] ; … }`` with
  objects: ``[expr.field]`` (literal), ``pfx:[expr.field]`` (IRI
  template), ``"constant"`` / ``pfx:constant`` (constants),
  ``@:OtherShape`` (shape link: the object is the linked shape's subject
  built from the SAME row — supported when both shapes read the same
  expression, the analogue of the RML same-source RefObjectMap that the
  plan rewriter reduces to a self-join-free read).
- Language tags / datatypes on objects are parsed and dropped, matching
  the reference's unimplemented literal annotations
  (``src/function/literal.rs:36-37`` TODO).

Unsupported constructs (MATCHER, JOIN/string operations, nested
iterators, JSON/XML sources, cross-expression shape links) raise
``ShexmlTranslateError`` with the construct named — same contract as the
engine's explicit ``todo!()``-style refusals.

The output plan shape is identical to ``rml.py``'s (Source → Project →
Extend → Serialize → Sink chains), so everything downstream — rewriter,
compiler, serializer, engine — is shared.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from mopper_spark.rml import _PlanBuilder, _compile_term_map, TermMap


class ShexmlTranslateError(ValueError):
    pass


@dataclass
class Iterator_:
    name: str
    kind: str  # csvperrow
    fields: dict[str, str] = field(default_factory=dict)  # field name -> column


@dataclass
class Expression:
    name: str
    branches: list[tuple[str, str]]  # (source name, iterator name)


@dataclass
class ShapeObject:
    kind: str  # "literal" | "iri" | "constant_iri" | "constant_lit" | "link"
    expr: str | None = None
    fld: str | None = None
    prefix_iri: str | None = None
    constant: str | None = None
    link: str | None = None


@dataclass
class Shape:
    name: str
    subject_prefix: str  # expanded prefix IRI
    subject_expr: str
    subject_field: str
    poms: list[tuple[str, ShapeObject]] = field(default_factory=list)


_PREFIX_RE = re.compile(r"^PREFIX\s+(\w*):\s*<([^>]*)>\s*$")
_SOURCE_RE = re.compile(r"^SOURCE\s+(\w+)\s+<([^>]*)>\s*$")
_ITER_RE = re.compile(r"^ITERATOR\s+(\w+)\s+<?([^>{]+?)>?\s*\{\s*$")
_FIELD_RE = re.compile(r"^FIELD\s+(\w+)\s+<([^>]*)>\s*$")
_EXPR_RE = re.compile(r"^EXPRESSION\s+(\w+)\s+<(.+)>\s*$")
_SHAPE_RE = re.compile(r"^:(\w+)\s+(\w*):\[(\w+)\.(\w+)\]\s*\{\s*$")
_POM_RE = re.compile(
    r"^(\w*):(\w+)\s+(.+?)\s*;?\s*$"
)
_OBJ_FIELD_RE = re.compile(r"^\[(\w+)\.(\w+)\](?:\s*@\w+)?$")
_OBJ_PREF_FIELD_RE = re.compile(r"^(\w*):\[(\w+)\.(\w+)\]$")
_OBJ_LINK_RE = re.compile(r"^@:(\w+)$")
_OBJ_LIT_RE = re.compile(r'^"([^"]*)"(?:\s*(?:@\w+|\^\^\S+))?$')
_OBJ_CONST_RE = re.compile(r"^(\w*):(\w[\w\-.]*)$")


@dataclass
class ShexmlDoc:
    prefixes: dict[str, str]
    sources: dict[str, str]
    iterators: dict[str, Iterator_]
    expressions: dict[str, Expression]
    shapes: list[Shape]


def parse_shexml(text: str) -> ShexmlDoc:
    prefixes: dict[str, str] = {}
    sources: dict[str, str] = {}
    iterators: dict[str, Iterator_] = {}
    expressions: dict[str, Expression] = {}
    shapes: list[Shape] = []

    lines = [ln.strip() for ln in text.splitlines()]
    i = 0
    while i < len(lines):
        ln = lines[i]
        i += 1
        if not ln or ln.startswith("#") or ln.startswith("//"):
            continue
        if m := _PREFIX_RE.match(ln):
            prefixes[m.group(1)] = m.group(2)
            continue
        if m := _SOURCE_RE.match(ln):
            sources[m.group(1)] = m.group(2)
            continue
        if m := _ITER_RE.match(ln):
            it = Iterator_(name=m.group(1), kind=m.group(2))
            if it.kind != "csvperrow":
                raise ShexmlTranslateError(
                    f"Iterator kind {it.kind!r} not supported (csvperrow only, "
                    "matching the reference's CSVRows-only execution)"
                )
            while i < len(lines):
                fl = lines[i]
                i += 1
                if fl == "}":
                    break
                if not fl or fl.startswith("#"):
                    continue
                fm = _FIELD_RE.match(fl)
                if not fm:
                    raise ShexmlTranslateError(f"Bad FIELD line: {fl!r}")
                it.fields[fm.group(1)] = fm.group(2)
            iterators[it.name] = it
            continue
        if m := _EXPR_RE.match(ln):
            body = m.group(2)
            branches = []
            for part in re.split(r"\s+UNION\s+", body):
                part = part.strip()
                pm = re.match(r"^(\w+)\.(\w+)$", part)
                if not pm:
                    raise ShexmlTranslateError(
                        f"Expression {part!r} not supported (plain "
                        "source.iterator and UNION only; JOIN/string ops are "
                        "out of the subset)"
                    )
                branches.append((pm.group(1), pm.group(2)))
            expressions[m.group(1)] = Expression(m.group(1), branches)
            continue
        if m := _SHAPE_RE.match(ln):
            pfx = m.group(2)
            if pfx not in prefixes:
                raise ShexmlTranslateError(f"Undefined prefix {pfx!r}:")
            shape = Shape(
                name=m.group(1),
                subject_prefix=prefixes[pfx],
                subject_expr=m.group(3),
                subject_field=m.group(4),
            )
            while i < len(lines):
                pl = lines[i]
                i += 1
                if pl == "}":
                    break
                if not pl or pl.startswith("#"):
                    continue
                pm = _POM_RE.match(pl)
                if not pm:
                    raise ShexmlTranslateError(f"Bad predicate-object line: {pl!r}")
                p_pfx, p_local, obj_txt = pm.groups()
                if p_pfx not in prefixes:
                    raise ShexmlTranslateError(f"Undefined prefix {p_pfx!r}:")
                predicate = prefixes[p_pfx] + p_local
                shape.poms.append((predicate, _parse_object(obj_txt, prefixes)))
            shapes.append(shape)
            continue
        raise ShexmlTranslateError(f"Unsupported ShExML construct: {ln!r}")

    return ShexmlDoc(prefixes, sources, iterators, expressions, shapes)


def _parse_object(txt: str, prefixes: dict[str, str]) -> ShapeObject:
    txt = txt.strip()
    if m := _OBJ_LINK_RE.match(txt):
        return ShapeObject(kind="link", link=m.group(1))
    if m := _OBJ_PREF_FIELD_RE.match(txt):
        pfx = m.group(1)
        if pfx not in prefixes:
            raise ShexmlTranslateError(f"Undefined prefix {pfx!r}:")
        return ShapeObject(
            kind="iri", prefix_iri=prefixes[pfx], expr=m.group(2), fld=m.group(3)
        )
    if m := _OBJ_FIELD_RE.match(txt):
        return ShapeObject(kind="literal", expr=m.group(1), fld=m.group(2))
    if m := _OBJ_LIT_RE.match(txt):
        return ShapeObject(kind="constant_lit", constant=m.group(1))
    if m := _OBJ_CONST_RE.match(txt):
        pfx = m.group(1)
        if pfx not in prefixes:
            raise ShexmlTranslateError(f"Undefined prefix {pfx!r}:")
        return ShapeObject(kind="constant_iri", constant=prefixes[pfx] + m.group(2))
    raise ShexmlTranslateError(f"Unsupported object expression: {txt!r}")


# --------------------------------------------------------------------------
# translation to plan
# --------------------------------------------------------------------------
def _iri_template_map(prefix_iri: str, column: str) -> TermMap:
    # '{' in the constant prefix would need escaping; prefix IRIs never
    # contain braces in practice — refuse loudly rather than mis-template
    if "{" in prefix_iri or "}" in prefix_iri:
        raise ShexmlTranslateError(f"Brace in prefix IRI {prefix_iri!r}")
    return TermMap(template=prefix_iri + "{" + column + "}", term_type="IRI")


def shexml_to_plan(text: str) -> dict:
    """Translate a ShExML document to an executable plan dict."""
    doc = parse_shexml(text)
    pb = _PlanBuilder()
    shapes_by_name = {s.name: s for s in doc.shapes}

    for shape in doc.shapes:
        expr = doc.expressions.get(shape.subject_expr)
        if expr is None:
            raise ShexmlTranslateError(
                f"Shape :{shape.name} references unknown expression "
                f"{shape.subject_expr!r}"
            )
        # one chain per union branch (union-into-sink semantics)
        for src_name, it_name in expr.branches:
            if src_name not in doc.sources:
                raise ShexmlTranslateError(f"Unknown SOURCE {src_name!r}")
            it = doc.iterators.get(it_name)
            if it is None:
                raise ShexmlTranslateError(f"Unknown ITERATOR {it_name!r}")

            def col_of(fld: str, where: str) -> str:
                if fld not in it.fields:
                    raise ShexmlTranslateError(
                        f"Unknown FIELD {fld!r} in {where} (iterator {it.name})"
                    )
                return it.fields[fld]

            extend: dict[str, dict] = {}
            subj_map = _iri_template_map(
                shape.subject_prefix, col_of(shape.subject_field, f":{shape.name}")
            )
            subj_var = f"?sx_{shape.name}_sm"
            extend[subj_var] = _compile_term_map(subj_map, "")
            lines: list[str] = []
            attrs = [col_of(shape.subject_field, f":{shape.name}")]

            for pi, (predicate, obj) in enumerate(shape.poms):
                p_var = f"?sx_{shape.name}_p{pi}"
                extend[p_var] = _compile_term_map(
                    TermMap(constant=predicate, constant_is_iri=True, term_type="IRI"),
                    "",
                )
                o_var = f"?sx_{shape.name}_o{pi}"
                if obj.kind == "link":
                    target = shapes_by_name.get(obj.link)
                    if target is None:
                        raise ShexmlTranslateError(
                            f"Shape link @:{obj.link} has no target shape"
                        )
                    if doc.expressions.get(target.subject_expr) is not expr:
                        raise ShexmlTranslateError(
                            f"Shape link @:{obj.link} crosses expressions "
                            f"({shape.subject_expr!r} → {target.subject_expr!r}); "
                            "only same-expression links are in the subset "
                            "(the RML same-source RefObjectMap analogue)"
                        )
                    o_map = _iri_template_map(
                        target.subject_prefix,
                        col_of(target.subject_field, f"@:{obj.link}"),
                    )
                    attrs.append(col_of(target.subject_field, f"@:{obj.link}"))
                elif obj.kind == "iri":
                    o_map = _iri_template_map(obj.prefix_iri, col_of(obj.fld, predicate))
                    attrs.append(col_of(obj.fld, predicate))
                elif obj.kind == "literal":
                    o_map = TermMap(reference=col_of(obj.fld, predicate), term_type="Literal")
                    attrs.append(col_of(obj.fld, predicate))
                elif obj.kind == "constant_iri":
                    o_map = TermMap(constant=obj.constant, constant_is_iri=True, term_type="IRI")
                else:  # constant_lit
                    o_map = TermMap(constant=obj.constant, term_type="Literal")
                extend[o_var] = _compile_term_map(o_map, "")
                lines.append(f"{subj_var} {p_var} {o_var} .")

            if not lines:
                continue
            src = pb.add(
                "SourceOp",
                {
                    "path": doc.sources[src_name],
                    "source_type": "File",
                    "root_iterator": {
                        "reference": None,
                        "reference_formulation": "CSVRows",
                        "fields": [],
                        "alias": None,
                    },
                },
                "Source",
            )
            proj = pb.add(
                "ProjectOp", {"projection_attributes": sorted(set(attrs))}, "Projection"
            )
            ext = pb.add("ExtendOp", extend, "Extend")
            ser = pb.add(
                "SerializerOp",
                {"template": "\n".join(lines), "format": "NQuads"},
                "Serialize",
            )
            sink = pb.add(
                "TargetOp", {"target_type": "StdOut", "data_format": "NQuads"}, "Sink"
            )
            pb.connect(src, proj)
            pb.connect(proj, ext)
            pb.connect(ext, ser)
            pb.connect(ser, sink)

    return pb.plan()
