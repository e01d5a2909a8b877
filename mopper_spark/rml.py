"""RML (Turtle) mapping → AlgeMapLoom plan translator.

Our from-scratch equivalent of the translation the reference delegates to
the external ``ltranslator`` crate (``/root/reference/src/lib.rs:234-242``,
``src/main.rs:112-127``): an RML/R2RML mapping document becomes the same
plan-JSON shape mopper executes (``nodes`` + indexed ``edges``), which then
flows through our rewriter/compiler/engine exactly like a pre-compiled
``mapping.json``.

Supported RML/R2RML surface (everything the reference's shipped test cases
use, ``test-resources/rml-testcases/*/mapping.ttl``):

- ``rml:logicalSource`` with ``rml:source`` (CSV path) and
  ``rml:referenceFormulation ql:CSV``
- ``rr:subjectMap`` (template/constant/reference, ``rr:termType``,
  ``rr:class``, ``rr:graph`` / ``rr:graphMap``) and the ``rr:subject``
  shortcut
- ``rr:predicateObjectMap`` with ``rr:predicate`` / ``rr:predicateMap``,
  ``rr:object`` / ``rr:objectMap`` (reference, template, constant,
  ``rr:termType``), per-POM ``rr:graph`` / ``rr:graphMap``
- ``rr:RefObjectMap``: ``rr:parentTriplesMap`` with zero or more
  ``rr:joinCondition`` (``rr:child`` / ``rr:parent``).  No join condition
  compiles to the reference's ``NaturalJoin`` node, which survives only as
  a self-join over a merged identical source (plan_rewriter.rs:169-204) —
  same semantics, same plan shape.  When the parent reads the SAME source
  but joins on *different* columns (e.g. rr:child "mgr_id" / rr:parent
  "id"), the rewriter keeps a true alias-prefixed self-join — a documented
  divergence from the reference, whose unconditional elimination would
  build the object from the current row with no join filtering (see
  ``rewriter.eliminate_self_joins``).

The emitted plan mirrors ltranslator's structure: per triples-map a chain
``Source → Project → Extend → Serialize → Sink`` for the non-join
predicate-object maps, plus one ``Join → Extend → Serialize → Sink`` chain
per ref-object-map (child edge first — the engine relies on edge order for
join sides, ``src/lib.rs:197-202``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from mopper_spark.turtle import RDF_TYPE, Term, TurtleDocument, parse_turtle

RR = "http://www.w3.org/ns/r2rml#"
RML = "http://semweb.mmlab.be/ns/rml#"
QL = "http://semweb.mmlab.be/ns/ql#"

_FORMULATIONS = {
    QL + "CSV": "CSVRows",
    # beyond reference parity (JSON/XML are roadmap-only there): simple
    # JSONPath/XPath iterators execute via sources._json_iterate/_xml_iterate
    QL + "JSONPath": "JSONPath",
    QL + "XPath": "XPath",
}


class RmlTranslateError(ValueError):
    pass


# --------------------------------------------------------------------------
# mapping model
# --------------------------------------------------------------------------
@dataclass
class TermMap:
    """One of template / constant / reference, plus a resolved term type."""

    template: str | None = None
    constant: str | None = None
    constant_is_iri: bool = False
    reference: str | None = None
    term_type: str | None = None  # "IRI" | "Literal" | "BlankNode"
    # rr:datatype / rr:language (constants per R2RML) — carried into the
    # plan's dtype_function/langtype_function; applied only under
    # MopperOptions.literal_annotations (reference parity default: off)
    datatype: str | None = None
    language: str | None = None

    def references(self) -> list[str]:
        if self.reference is not None:
            return [self.reference]
        if self.template is not None:
            from mopper_spark.functions.templates import parse_template

            return [t for is_var, t in parse_template(self.template) if is_var]
        return []


@dataclass
class RefObjectMap:
    parent: Term  # parent triples-map node
    join_conditions: list[tuple[str, str]] = field(default_factory=list)


@dataclass
class PredicateObjectMap:
    predicates: list[TermMap]
    objects: list[TermMap | RefObjectMap]
    graphs: list[TermMap]


@dataclass
class TriplesMap:
    name: str
    source_path: str
    formulation: str
    iterator: str | None
    subject: TermMap
    classes: list[str]
    subject_graphs: list[TermMap]
    poms: list[PredicateObjectMap]


# --------------------------------------------------------------------------
# RML document → TriplesMap model
# --------------------------------------------------------------------------
def _term_map(doc: TurtleDocument, node: Term, default_type: str) -> TermMap:
    tm = TermMap()
    tpl = doc.value(node, RR + "template")
    if tpl is not None:
        tm.template = tpl[1]
    const = doc.value(node, RR + "constant")
    if const is not None:
        tm.constant = const[1]
        tm.constant_is_iri = const[0] == "iri"
    ref = doc.value(node, RML + "reference") or doc.value(node, RR + "column")
    if ref is not None:
        tm.reference = ref[1]

    dt = doc.value(node, RR + "datatype")
    if dt is not None:
        tm.datatype = dt[1]
    lng = doc.value(node, RR + "language")
    if lng is not None:
        tm.language = lng[1]

    tt = doc.value(node, RR + "termType")
    if tt is not None:
        tm.term_type = tt[1].removeprefix(RR)
    elif default_type == "object":
        # R2RML §7.4: object maps default to Literal for references /
        # constant literals, IRI otherwise
        if tm.reference is not None or (tm.constant is not None and not tm.constant_is_iri):
            tm.term_type = "Literal"
        else:
            tm.term_type = "IRI"
    else:
        tm.term_type = "IRI"
    return tm


def _constant_shortcut(term: Term) -> TermMap:
    return TermMap(
        constant=term[1], constant_is_iri=term[0] == "iri",
        term_type="IRI" if term[0] == "iri" else "Literal",
    )


def _graph_maps(doc: TurtleDocument, node: Term) -> list[TermMap]:
    out = [_constant_shortcut(g) for g in doc.objects(node, RR + "graph")]
    out += [_term_map(doc, gm, "graph") for gm in doc.objects(node, RR + "graphMap")]
    # rr:defaultGraph means "no named graph"
    return [g for g in out if g.constant != RR + "defaultGraph"]


def _logical_source(doc: TurtleDocument, tm_node: Term) -> tuple[str, str, str | None]:
    ls = doc.value(tm_node, RML + "logicalSource") or doc.value(
        tm_node, RR + "logicalTable"
    )
    if ls is None:
        raise RmlTranslateError(f"Triples map {tm_node[1]} has no rml:logicalSource")
    src = doc.value(ls, RML + "source") or doc.value(ls, RR + "tableName")
    if src is None:
        raise RmlTranslateError(f"Logical source of {tm_node[1]} has no rml:source")
    form = doc.value(ls, RML + "referenceFormulation")
    formulation = "CSVRows"
    if form is not None:
        if form[1] not in _FORMULATIONS:
            supported = ", ".join(sorted(f.rsplit("#", 1)[-1] for f in _FORMULATIONS))
            raise RmlTranslateError(
                f"Reference formulation {form[1]!r} not supported ({supported})"
            )
        formulation = _FORMULATIONS[form[1]]
    iterator = doc.value(ls, RML + "iterator")
    return src[1], formulation, iterator[1] if iterator else None


def parse_rml(text: str) -> tuple[list[TriplesMap], dict[Term, TriplesMap], str | None]:
    doc = parse_turtle(text)
    nodes = doc.subjects_with(RML + "logicalSource") + doc.subjects_with(
        RR + "logicalTable"
    )
    maps: list[TriplesMap] = []
    by_node: dict[Term, TriplesMap] = {}
    for i, node in enumerate(nodes):
        source_path, formulation, iterator = _logical_source(doc, node)

        sm_node = doc.value(node, RR + "subjectMap")
        if sm_node is not None:
            subject = _term_map(doc, sm_node, "subject")
            classes = [c[1] for c in doc.objects(sm_node, RR + "class")]
            subject_graphs = _graph_maps(doc, sm_node)
        else:
            shortcut = doc.value(node, RR + "subject")
            if shortcut is None:
                raise RmlTranslateError(f"Triples map {node[1]} has no subject map")
            subject = _constant_shortcut(shortcut)
            classes, subject_graphs = [], []

        poms: list[PredicateObjectMap] = []
        for pom_node in doc.objects(node, RR + "predicateObjectMap"):
            predicates = [
                _constant_shortcut(p) for p in doc.objects(pom_node, RR + "predicate")
            ] + [
                _term_map(doc, pm, "predicate")
                for pm in doc.objects(pom_node, RR + "predicateMap")
            ]
            objects: list[TermMap | RefObjectMap] = [
                _constant_shortcut(o) for o in doc.objects(pom_node, RR + "object")
            ]
            for om in doc.objects(pom_node, RR + "objectMap"):
                parent = doc.value(om, RR + "parentTriplesMap")
                if parent is not None:
                    conds = []
                    for jc in doc.objects(om, RR + "joinCondition"):
                        child = doc.value(jc, RR + "child")
                        par = doc.value(jc, RR + "parent")
                        if child is None or par is None:
                            missing = "rr:child" if child is None else "rr:parent"
                            raise RmlTranslateError(
                                f"rr:joinCondition {jc[1]} of object map {om[1]} "
                                f"is missing {missing}"
                            )
                        conds.append((child[1], par[1]))
                    objects.append(RefObjectMap(parent=parent, join_conditions=conds))
                else:
                    objects.append(_term_map(doc, om, "object"))
            poms.append(
                PredicateObjectMap(
                    predicates=predicates,
                    objects=objects,
                    graphs=_graph_maps(doc, pom_node),
                )
            )

        name = node[1].rsplit("/", 1)[-1] if node[0] == "iri" else f"tm{i}"
        tmap = TriplesMap(
            name=f"tm{i}_{name}",
            source_path=source_path,
            formulation=formulation,
            iterator=iterator,
            subject=subject,
            classes=classes,
            subject_graphs=subject_graphs,
            poms=poms,
        )
        maps.append(tmap)
        by_node[node] = tmap
    return maps, by_node, doc.base


# --------------------------------------------------------------------------
# TriplesMap model → AlgeMapLoom plan JSON
# --------------------------------------------------------------------------
def _fn_reference(name: str, prefix: str = "") -> dict:
    return {"type": "Reference", "value": prefix + name}


def _fn_template_iri(template: str, base_iri: str, prefix: str = "") -> dict:
    tm = TermMap(template=template)
    return {
        "type": "Iri",
        "base_iri": base_iri,
        "inner_function": {
            "type": "TemplateFunctionValue",
            "template": _prefix_template(template, prefix),
            "variable_function_pairs": [
                [prefix + v, {"type": "UriEncode",
                              "inner_function": _fn_reference(v, prefix)}]
                for v in tm.references()
            ],
        },
    }


def _prefix_template(template: str, prefix: str) -> str:
    if not prefix:
        return template
    from mopper_spark.functions.templates import parse_template

    out = []
    for is_var, text in parse_template(template):
        if is_var:
            out.append("{" + prefix + text + "}")
        else:
            out.append(text.replace("\\", "\\\\").replace("{", "\\{").replace("}", "\\}"))
    return "".join(out)


def _compile_term_map(tm: TermMap, base_iri: str, prefix: str = "") -> dict:
    """TermMap → function-tree JSON (the ExtendOp expression language)."""
    if tm.term_type == "BlankNode":
        if tm.template is not None:
            inner = {"type": "TemplateString", "value": _prefix_template(tm.template, prefix)}
        elif tm.reference is not None:
            inner = _fn_reference(tm.reference, prefix)
        else:
            inner = {"type": "Constant", "value": tm.constant or ""}
        return {"type": "BlankNode", "inner_function": inner}

    if tm.term_type == "IRI":
        if tm.template is not None:
            return _fn_template_iri(tm.template, base_iri, prefix)
        if tm.constant is not None:
            return {"type": "Iri", "base_iri": base_iri,
                    "inner_function": {"type": "Constant", "value": tm.constant}}
        if tm.reference is not None:
            return {"type": "Iri", "base_iri": base_iri,
                    "inner_function": _fn_reference(tm.reference, prefix)}
        raise RmlTranslateError("Empty IRI term map")

    # Literal
    if tm.reference is not None:
        inner = _fn_reference(tm.reference, prefix)
    elif tm.template is not None:
        inner = {"type": "TemplateString", "value": _prefix_template(tm.template, prefix)}
    else:
        inner = {"type": "Constant", "value": tm.constant or ""}
    dtype_fn = {"type": "Constant", "value": tm.datatype} if tm.datatype else None
    lang_fn = {"type": "Constant", "value": tm.language} if tm.language else None
    return {"type": "Literal", "inner_function": inner,
            "dtype_function": dtype_fn, "langtype_function": lang_fn}


class _PlanBuilder:
    def __init__(self) -> None:
        self.nodes: list[dict] = []
        self.edges: list[list] = []
        self._n = 0

    def add(self, op_type: str, config: dict, prefix: str) -> int:
        idx = len(self.nodes)
        self.nodes.append(
            {"id": f"{prefix}_{self._n}", "operator": {"type": op_type, "config": config}}
        )
        self._n += 1
        return idx

    def connect(self, src: int, dst: int, fragment: str = "default") -> None:
        self.edges.append([src, dst, {"fragment": fragment}])

    def plan(self) -> dict:
        return {"nodes": self.nodes, "edges": self.edges}


def rml_to_plan(text: str, base_iri: str | None = None) -> dict:
    """Translate an RML Turtle mapping document to an executable plan dict."""
    maps, by_node, doc_base = parse_rml(text)
    base = base_iri or doc_base or ""
    pb = _PlanBuilder()
    join_n = 0

    # one Source+Project pair per triples map, like ltranslator; the plan
    # rewriter merges identical sources afterwards (plan_rewriter.rs:72-119)
    def make_source(tmap: TriplesMap, attrs: list[str]) -> int:
        src = pb.add(
            "SourceOp",
            {
                "path": tmap.source_path,
                "source_type": "File",
                "root_iterator": {
                    "reference": tmap.iterator,
                    "reference_formulation": tmap.formulation,
                    "fields": [],
                    "alias": None,
                },
            },
            "Source",
        )
        proj = pb.add(
            "ProjectOp",
            {"projection_attributes": sorted(set(attrs))},
            "Projection",
        )
        pb.connect(src, proj)
        return proj

    def graph_vars(tmap: TriplesMap, pom: PredicateObjectMap | None,
                   extend: dict, made: dict[int, str]) -> list[str]:
        """Bind subject-level + POM-level graph maps as extend vars."""
        out: list[str] = []
        gmaps = list(tmap.subject_graphs) + (list(pom.graphs) if pom else [])
        for g in gmaps:
            key = id(g)
            if key not in made:
                var = f"?{tmap.name}_gm{len(made)}"
                extend[var] = _compile_term_map(g, base)
                made[key] = var
            out.append(made[key])
        return out

    for tmap in maps:
        nonjoin_poms = [
            (pi, pom) for pi, pom in enumerate(tmap.poms)
            if any(not isinstance(o, RefObjectMap) for o in pom.objects)
            or not pom.objects
        ]
        join_poms = [
            (pi, pom, obj)
            for pi, pom in enumerate(tmap.poms)
            for obj in pom.objects
            if isinstance(obj, RefObjectMap)
        ]

        # ---- non-join chain (subject classes + plain POMs) --------------
        if tmap.classes or nonjoin_poms or not join_poms:
            extend: dict[str, dict] = {}
            made_graphs: dict[int, str] = {}
            subj_var = f"?{tmap.name}_sm"
            extend[subj_var] = _compile_term_map(tmap.subject, base)
            lines: list[str] = []

            sg_vars = graph_vars(tmap, None, extend, made_graphs)
            for cls in tmap.classes:
                stmt = f"{subj_var} <{RDF_TYPE}> <{cls}>"
                if sg_vars:
                    lines += [f"{stmt} {g} ." for g in sg_vars]
                else:
                    lines.append(f"{stmt} .")

            for pi, pom in nonjoin_poms:
                gvars = graph_vars(tmap, pom, extend, made_graphs)
                for pj, pred in enumerate(pom.predicates):
                    p_var = f"?{tmap.name}_p{pi}_{pj}"
                    extend[p_var] = _compile_term_map(pred, base)
                    for oj, obj in enumerate(pom.objects):
                        if isinstance(obj, RefObjectMap):
                            continue
                        o_var = f"?{tmap.name}_o{pi}_{oj}"
                        extend[o_var] = _compile_term_map(obj, base)
                        stmt = f"{subj_var} {p_var} {o_var}"
                        if gvars:
                            lines += [f"{stmt} {g} ." for g in gvars]
                        else:
                            lines.append(f"{stmt} .")

            if lines:
                attrs = tmap.subject.references() + [
                    r
                    for _, pom in nonjoin_poms
                    for m in (pom.predicates
                              + [o for o in pom.objects if isinstance(o, TermMap)]
                              + pom.graphs)
                    for r in m.references()
                ] + [r for g in tmap.subject_graphs for r in g.references()]
                proj = make_source(tmap, attrs)
                ext = pb.add("ExtendOp", extend, "Extend")
                ser = pb.add(
                    "SerializerOp",
                    {"template": "\n".join(lines), "format": "NQuads"},
                    "Serialize",
                )
                sink = pb.add(
                    "TargetOp",
                    {"target_type": "StdOut", "data_format": "NQuads"},
                    "Sink",
                )
                pb.connect(proj, ext)
                pb.connect(ext, ser)
                pb.connect(ser, sink)

        # ---- one join chain per ref-object-map --------------------------
        for pi, pom, rom in join_poms:
            parent = by_node.get(rom.parent)
            if parent is None:
                raise RmlTranslateError(
                    f"rr:parentTriplesMap {rom.parent[1]} is not a triples map"
                )
            alias = f"join_{join_n}"
            join_n += 1

            extend = {}
            made_graphs = {}
            subj_var = f"?{tmap.name}_sm"
            extend[subj_var] = _compile_term_map(tmap.subject, base)
            o_var = f"?{tmap.name}_o{pi}_rom"
            extend[o_var] = _compile_term_map(parent.subject, base, prefix=f"{alias}_")

            lines = []
            gvars = graph_vars(tmap, pom, extend, made_graphs)
            for pj, pred in enumerate(pom.predicates):
                p_var = f"?{tmap.name}_p{pi}_{pj}"
                extend[p_var] = _compile_term_map(pred, base)
                stmt = f"{subj_var} {p_var} {o_var}"
                if gvars:
                    lines += [f"{stmt} {g} ." for g in gvars]
                else:
                    lines.append(f"{stmt} .")

            child_attrs = (
                tmap.subject.references()
                + [c for c, _ in rom.join_conditions]
                + [r for m in pom.predicates + pom.graphs for r in m.references()]
                + [r for g in tmap.subject_graphs for r in g.references()]
            )
            parent_attrs = parent.subject.references() + [
                p for _, p in rom.join_conditions
            ]
            child_proj = make_source(tmap, child_attrs)
            parent_proj = make_source(parent, parent_attrs)
            join = pb.add(
                "JoinOp",
                {
                    "left_right_attr_pairs": [[c, p] for c, p in rom.join_conditions],
                    "join_type": "InnerJoin" if rom.join_conditions else "NaturalJoin",
                    "predicate_type": "Equal",
                    "join_alias": alias,
                },
                "Join",
            )
            # child edge FIRST: left/child = from[0] (src/lib.rs:197-202)
            pb.connect(child_proj, join, alias)
            pb.connect(parent_proj, join, alias)
            ext = pb.add("ExtendOp", extend, "Extend")
            ser = pb.add(
                "SerializerOp",
                {"template": "\n".join(lines), "format": "NQuads"},
                "Serialize",
            )
            sink = pb.add(
                "TargetOp", {"target_type": "StdOut", "data_format": "NQuads"}, "Sink"
            )
            pb.connect(join, ext)
            pb.connect(ext, ser)
            pb.connect(ser, sink)

    return pb.plan()


def mapping_to_plan(text: str, lang: str = "rml") -> dict:
    """Reference-API analogue of ``mopper::mapping_to_plan`` (lib.rs:234-242)."""
    lang = lang.lower()
    if lang == "rml":
        return rml_to_plan(text)
    if lang == "shexml":
        from mopper_spark.shexml import shexml_to_plan

        return shexml_to_plan(text)
    raise ValueError(f"Unknown mapping language {lang!r}")
