"""ShExML mapping → AlgeMapLoom plan translator (pragmatic subset).

The reference accepts ShExML mapping documents through the same external
``ltranslator`` crate as RML (``/root/reference/src/lib.rs:234-242``,
``MappingLang::ShExML``); this module is our from-scratch equivalent for
the common CSV-backed subset of the language
(https://shexml.herminiogarcia.com/spec/):

- ``PREFIX pfx: <iri>``
- ``SOURCE name <file-or-url>``
- ``ITERATOR name csvperrow { FIELD f <column> ... }`` plus
  ``<jsonpath: $.items[*]>`` / ``<xpath: /root/item>`` iterators over the
  engine's JSON/XML source subsets (beyond the reference, whose engine
  executes only CSV rows, lib.rs:129-137); FIELD paths must be flat keys
  / attribute-or-child names — nested paths are named refusals
- ``EXPRESSION name <source.iterator>`` and N-way
  ``<a.b UNION c.d [UNION …]>`` (each branch instantiates every shape
  that uses the expression — union-into-one-sink semantics)
- Shapes: ``:Name pfx:[expr.field] { pfx:p [expr.field] ; … }`` with
  objects: ``[expr.field]`` (literal), ``pfx:[expr.field]`` (IRI
  template), ``"constant"`` / ``pfx:constant`` (constants),
  ``@:OtherShape`` (shape link: the object is the linked shape's subject
  built from the SAME row — supported when both shapes read the same
  underlying rows, i.e. their expressions resolve to the same
  (source, iterator) branch set; the analogue of the RML same-source
  RefObjectMap).
- ``MATCHER name <v1, v2 AS Canonical & v3 AS Other>`` declarations and
  ``[expr.field MATCHING name]`` usage (spec §Matchers): values equal to a
  listed variant are replaced by that rule's canonical form, others pass
  through unchanged.  Compiles to the plan-dialect ``Match`` function
  (native chained ``isin``/``when``).
- String operations (spec §"Applying string operations"): concatenation
  of fields and quoted literals with ``+`` — both ``[a.f + "-" + a.g]``
  and ``[a.f] + "-" + [a.g]`` spellings are accepted.
- Language tags on field objects (``[expr.field] @en``) are carried into
  the plan and serialized as ``"v"@en`` when
  ``MopperOptions.literal_annotations`` is on; with the default
  (reference-parity) options they are dropped, matching the reference's
  unimplemented literal annotations (``src/function/literal.rs:36-37``
  TODO).

Unsupported constructs (expression-level JOIN, nested iterators, JSON/XML
sources, shape links whose expressions read different rows) raise
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
    kind: str  # raw kind text ("csvperrow" | "jsonpath: …" | "xpath: …")
    fields: dict[str, str] = field(default_factory=dict)  # field name -> column
    formulation: str = "CSVRows"  # CSVRows | JSONPath | XPath
    query: str | None = None  # iterator expression for JSONPath/XPath


@dataclass
class Expression:
    name: str
    branches: list[tuple[str, str]]  # (source name, iterator name)


@dataclass
class ShapeObject:
    kind: str  # "literal" | "iri" | "constant_iri" | "constant_lit" | "link" | "concat"
    expr: str | None = None
    fld: str | None = None
    prefix_iri: str | None = None
    constant: str | None = None
    link: str | None = None
    matcher: str | None = None
    #: for kind == "concat": ordered (is_field, text-or-(expr, fld)) parts
    parts: list | None = None
    #: language tag ("en", "en-US") — serialized only under
    #: MopperOptions.literal_annotations
    lang: str | None = None


@dataclass
class Shape:
    name: str
    subject_prefix: str  # expanded prefix IRI
    subject_expr: str
    subject_field: str
    subject_matcher: str | None = None
    poms: list[tuple[str, ShapeObject]] = field(default_factory=list)


_PREFIX_RE = re.compile(r"^PREFIX\s+(\w*):\s*<([^>]*)>\s*$")
_SOURCE_RE = re.compile(r"^SOURCE\s+(\w+)\s+<([^>]*)>\s*$")
_ITER_RE = re.compile(r"^ITERATOR\s+(\w+)\s+<?([^>{]+?)>?\s*\{\s*$")
_FIELD_RE = re.compile(r"^FIELD\s+(\w+)\s+<([^>]*)>\s*$")
_EXPR_RE = re.compile(r"^EXPRESSION\s+(\w+)\s+<(.+)>\s*$")
_MATCHER_RE = re.compile(r"^MATCHER\s+(\w+)\s+<(.+)>\s*$")
_SHAPE_RE = re.compile(
    r"^:(\w+)\s+(\w*):\[(\w+)\.(\w+)(?:\s+MATCHING\s+(\w+))?\]\s*\{\s*$"
)
_POM_RE = re.compile(
    r"^(\w*):(\w+)\s+(.+?)\s*;?\s*$"
)
_OBJ_FIELD_RE = re.compile(
    r"^\[(\w+)\.(\w+)(?:\s+MATCHING\s+(\w+))?\](?:\s*@(\w+(?:-\w+)*))?$"
)
_OBJ_PREF_FIELD_RE = re.compile(
    r"^(\w*):\[(\w+)\.(\w+)(?:\s+MATCHING\s+(\w+))?\]$"
)
_OBJ_LINK_RE = re.compile(r"^@:(\w+)$")
_OBJ_LIT_RE = re.compile(r'^"([^"]*)"(?:\s*(?:@\w+|\^\^\S+))?$')
_OBJ_CONST_RE = re.compile(r"^(\w*):(\w[\w\-.]*)$")
#: one term of a string operation: a [expr.field] slot or a "literal"
_CONCAT_TERM_RE = re.compile(r'\[?(\w+)\.(\w+)\]?|"([^"]*)"')


@dataclass
class ShexmlDoc:
    prefixes: dict[str, str]
    sources: dict[str, str]
    iterators: dict[str, Iterator_]
    expressions: dict[str, Expression]
    shapes: list[Shape]
    #: matcher name → ((canonical, (variant, ...)), ...)
    matchers: dict[str, tuple] = field(default_factory=dict)


def _split_plus(txt: str) -> list[str]:
    """Split a string-operation body on top-level ``+`` (quote-aware)."""
    parts: list[str] = []
    cur: list[str] = []
    in_quote = False
    for ch in txt:
        if ch == '"':
            in_quote = not in_quote
            cur.append(ch)
        elif ch == "+" and not in_quote:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur).strip())
    return parts


def parse_shexml(text: str) -> ShexmlDoc:
    prefixes: dict[str, str] = {}
    sources: dict[str, str] = {}
    iterators: dict[str, Iterator_] = {}
    expressions: dict[str, Expression] = {}
    shapes: list[Shape] = []
    matchers: dict[str, tuple] = {}

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
            it = Iterator_(name=m.group(1), kind=m.group(2).strip())
            if it.kind == "csvperrow":
                it.formulation, it.query = "CSVRows", None
            elif it.kind.startswith("jsonpath:"):
                it.formulation = "JSONPath"
                it.query = it.kind.split(":", 1)[1].strip()
            elif it.kind.startswith("xpath:"):
                it.formulation = "XPath"
                it.query = it.kind.split(":", 1)[1].strip()
            else:
                raise ShexmlTranslateError(
                    f"Iterator kind {it.kind!r} not supported (csvperrow, "
                    "jsonpath: …, xpath: … — the formulations the engine's "
                    "source layer executes)"
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
                col = fm.group(2)
                if it.formulation == "JSONPath":
                    # flat keys only: the iterated objects' fields become
                    # columns; nested paths are a named refusal
                    col = col.removeprefix("$.").removeprefix("$")
                    if re.search(r"[.\[\]/]", col):
                        raise ShexmlTranslateError(
                            f"FIELD path {fm.group(2)!r} not supported "
                            "(flat keys of the iterated object only)"
                        )
                elif it.formulation == "XPath":
                    col = col.lstrip("./@")
                    if re.search(r"[/\[\]]", col):
                        raise ShexmlTranslateError(
                            f"FIELD path {fm.group(2)!r} not supported "
                            "(attributes and single child elements only)"
                        )
                it.fields[fm.group(1)] = col
            iterators[it.name] = it
            continue
        if m := _MATCHER_RE.match(ln):
            rules_: list[tuple[str, tuple[str, ...]]] = []
            for rule in m.group(2).split("&"):
                rm = re.match(r"^(.*?)\s+AS\s+(.+?)\s*$", rule.strip())
                if not rm:
                    raise ShexmlTranslateError(
                        f"Bad MATCHER rule {rule.strip()!r} (expected "
                        "'variant[, variant…] AS Canonical')"
                    )
                variants = [v.strip() for v in rm.group(1).split(",") if v.strip()]
                canonical = rm.group(2).strip()
                # the canonical form also matches itself (idempotent apply)
                rules_.append((canonical, tuple(variants + [canonical])))
            matchers[m.group(1)] = tuple(rules_)
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
                        "source.iterator and UNION only; JOIN is out of "
                        "the subset)"
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
                subject_matcher=m.group(5),
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

    return ShexmlDoc(prefixes, sources, iterators, expressions, shapes, matchers)


_CONCAT_FIELD_RE = re.compile(r"^\[?(\w+)\.(\w+)(?:\s+MATCHING\s+(\w+))?\]?$")
_CONCAT_LIT_RE = re.compile(r'^"([^"]*)"$')


def _parse_object(txt: str, prefixes: dict[str, str]) -> ShapeObject:
    txt = txt.strip()
    if m := _OBJ_LINK_RE.match(txt):
        return ShapeObject(kind="link", link=m.group(1))
    if m := _OBJ_PREF_FIELD_RE.match(txt):
        pfx = m.group(1)
        if pfx not in prefixes:
            raise ShexmlTranslateError(f"Undefined prefix {pfx!r}:")
        return ShapeObject(
            kind="iri", prefix_iri=prefixes[pfx], expr=m.group(2), fld=m.group(3),
            matcher=m.group(4),
        )
    if m := _OBJ_FIELD_RE.match(txt):
        return ShapeObject(
            kind="literal", expr=m.group(1), fld=m.group(2), matcher=m.group(3),
            lang=m.group(4),
        )
    if m := _OBJ_LIT_RE.match(txt):
        return ShapeObject(kind="constant_lit", constant=m.group(1))
    if m := _OBJ_CONST_RE.match(txt):
        pfx = m.group(1)
        if pfx not in prefixes:
            raise ShexmlTranslateError(f"Undefined prefix {pfx!r}:")
        return ShapeObject(kind="constant_iri", constant=prefixes[pfx] + m.group(2))
    toks = _split_plus(txt)
    if len(toks) > 1:
        # string operation: concatenation of field slots and literals.
        # Normalize the outer-bracket spelling [a.f + "-" + a.g] to
        # per-token slots.
        if toks[0].startswith("[") and not toks[0].endswith("]"):
            toks[0] = toks[0][1:]
            if toks[-1].endswith("]"):
                toks[-1] = toks[-1][:-1].strip()
        parts: list = []
        for t in toks:
            t = t.strip()
            if m := _CONCAT_LIT_RE.match(t):
                parts.append(("lit", m.group(1)))
            elif m := _CONCAT_FIELD_RE.match(t):
                parts.append(("field", m.group(1), m.group(2), m.group(3)))
            else:
                raise ShexmlTranslateError(
                    f"Unsupported string-operation term {t!r} (field slots "
                    "and quoted literals joined by '+' only)"
                )
        return ShapeObject(kind="concat", parts=parts)
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


def _match_rules_json(doc: ShexmlDoc, matcher_name: str) -> list:
    rules_ = doc.matchers.get(matcher_name)
    if rules_ is None:
        raise ShexmlTranslateError(f"Unknown MATCHER {matcher_name!r}")
    return [[canonical, list(variants)] for canonical, variants in rules_]


def _ref_fn(doc: ShexmlDoc, column: str, matcher_name: str | None) -> dict:
    fn: dict = {"type": "Reference", "value": column}
    if matcher_name:
        fn = {
            "type": "Match",
            "inner_function": fn,
            "rules": _match_rules_json(doc, matcher_name),
        }
    return fn


def _iri_fn(
    doc: ShexmlDoc, prefix_iri: str, column: str, matcher_name: str | None
) -> dict:
    """IRI template function JSON — identical to rml._fn_template_iri output
    when no matcher applies, with the Match node threaded below UriEncode
    otherwise (normalize first, THEN percent-encode)."""
    if "{" in prefix_iri or "}" in prefix_iri:
        raise ShexmlTranslateError(f"Brace in prefix IRI {prefix_iri!r}")
    return {
        "type": "Iri",
        "base_iri": "",
        "inner_function": {
            "type": "TemplateFunctionValue",
            "template": prefix_iri + "{" + column + "}",
            "variable_function_pairs": [
                [column, {"type": "UriEncode",
                          "inner_function": _ref_fn(doc, column, matcher_name)}]
            ],
        },
    }


def _literal_fn(
    doc: ShexmlDoc, column: str, matcher_name: str | None, lang: str | None = None
) -> dict:
    return {
        "type": "Literal",
        "inner_function": _ref_fn(doc, column, matcher_name),
        "dtype_function": None,
        "langtype_function": {"type": "Constant", "value": lang} if lang else None,
    }


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
            subj_var = f"?sx_{shape.name}_sm"
            subj_col = col_of(shape.subject_field, f":{shape.name}")
            extend[subj_var] = _iri_fn(
                doc, shape.subject_prefix, subj_col, shape.subject_matcher
            )
            lines: list[str] = []
            attrs = [subj_col]

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
                    target_expr = doc.expressions.get(target.subject_expr)
                    if target_expr is None or sorted(target_expr.branches) != sorted(
                        expr.branches
                    ):
                        raise ShexmlTranslateError(
                            f"Shape link @:{obj.link} crosses expressions over "
                            f"different rows ({shape.subject_expr!r} → "
                            f"{target.subject_expr!r}); links are supported when "
                            "both expressions resolve to the same "
                            "(source, iterator) branches — the RML same-source "
                            "RefObjectMap analogue"
                        )
                    link_col = col_of(target.subject_field, f"@:{obj.link}")
                    o_fn = _iri_fn(
                        doc, target.subject_prefix, link_col, target.subject_matcher
                    )
                    attrs.append(link_col)
                elif obj.kind == "iri":
                    o_fn = _iri_fn(
                        doc, obj.prefix_iri, col_of(obj.fld, predicate), obj.matcher
                    )
                    attrs.append(col_of(obj.fld, predicate))
                elif obj.kind == "literal":
                    o_fn = _literal_fn(
                        doc, col_of(obj.fld, predicate), obj.matcher, obj.lang
                    )
                    attrs.append(col_of(obj.fld, predicate))
                elif obj.kind == "concat":
                    inners = []
                    for part in obj.parts:
                        if part[0] == "lit":
                            inners.append({"type": "Constant", "value": part[1]})
                        else:
                            _, _pexpr, pfld, pmatcher = part
                            pcol = col_of(pfld, predicate)
                            inners.append(_ref_fn(doc, pcol, pmatcher))
                            attrs.append(pcol)
                    o_fn = {
                        "type": "Literal",
                        "inner_function": {
                            "type": "Concatenate",
                            "inner_functions": inners,
                            "separator": "",
                        },
                        "dtype_function": None,
                        "langtype_function": None,
                    }
                elif obj.kind == "constant_iri":
                    o_fn = _compile_term_map(
                        TermMap(constant=obj.constant, constant_is_iri=True,
                                term_type="IRI"),
                        "",
                    )
                else:  # constant_lit
                    o_fn = _compile_term_map(
                        TermMap(constant=obj.constant, term_type="Literal"), ""
                    )
                extend[o_var] = o_fn
                lines.append(f"{subj_var} {p_var} {o_var} .")

            if not lines:
                continue
            src = pb.add(
                "SourceOp",
                {
                    "path": doc.sources[src_name],
                    "source_type": "File",
                    "root_iterator": {
                        "reference": it.query,
                        "reference_formulation": it.formulation,
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
