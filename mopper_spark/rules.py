"""The mapping-rule function-tree model (mopper's Extend expression language).

One dataclass per function in the AlgeMapLoom ``Function`` enum, as observed
through the reference's exhaustive dispatch
(``/root/reference/src/operator/extension.rs:124-190``).  ``from_json``
accepts the exact JSON shapes found in the shipped plan files
(``/root/reference/test-resources/rml-testcases/*/mapping.json``).

The reference leaves ``Concatenate``/``FnO``/``Lower``/``Upper``/``Replace``
as ``todo!()``; we implement them (they are one-liners in Spark) and mark
them as extensions beyond reference parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


class Function:
    """Base class for mapping function-tree nodes."""

    __slots__ = ()


@dataclass(frozen=True)
class Reference(Function):
    value: str


@dataclass(frozen=True)
class Constant(Function):
    value: str


@dataclass(frozen=True)
class TemplateString(Function):
    template: str


@dataclass(frozen=True)
class TemplateFunctionValue(Function):
    template: str
    variable_function_pairs: tuple[tuple[str, Function], ...]


@dataclass(frozen=True)
class Iri(Function):
    inner: Function
    base_iri: Optional[str] = None


@dataclass(frozen=True)
class Literal(Function):
    inner: Function
    # dtype/langtype exist in the plan schema but the reference never applies
    # them (src/function/literal.rs:36-37 TODO). We carry them for fidelity.
    dtype: Optional[Function] = None
    lang: Optional[Function] = None


@dataclass(frozen=True)
class BlankNode(Function):
    inner: Function


@dataclass(frozen=True)
class UriEncode(Function):
    inner: Function


@dataclass(frozen=True)
class Concatenate(Function):
    """Extension: reference declares but does not implement (todo!())."""

    inners: tuple[Function, ...]
    separator: str = ""


@dataclass(frozen=True)
class Lower(Function):
    inner: Function


@dataclass(frozen=True)
class Upper(Function):
    inner: Function


@dataclass(frozen=True)
class Replace(Function):
    inner: Function
    old: str = ""
    new: str = ""


@dataclass(frozen=True)
class Match(Function):
    """ShExML MATCHER normalization (beyond the reference's plan schema —
    it routes ShExML through the external ``ltranslator`` crate,
    lib.rs:234-242; spec: shexml.herminiogarcia.com §Matchers): full-string
    equality against each rule's variants replaces the value with that
    rule's canonical form; non-matching values pass through unchanged."""

    inner: Function
    rules: tuple[tuple[str, tuple[str, ...]], ...] = field(default_factory=tuple)
    # ((canonical, (variant, ...)), ...) — first matching rule wins


@dataclass(frozen=True)
class FnO(Function):
    """Function-Ontology call: dispatched against a registry of named
    vectorized Python functions at compile time (reference: unimplemented)."""

    function: str
    parameters: tuple[tuple[str, Function], ...] = field(default_factory=tuple)


def from_json(obj: dict) -> Function:
    """Parse one AlgeMapLoom JSON function config into a Function tree."""
    typ = obj["type"]
    if typ == "Reference":
        return Reference(obj["value"])
    if typ == "Constant":
        return Constant(obj["value"])
    if typ == "TemplateString":
        return TemplateString(obj["value"])
    if typ == "TemplateFunctionValue":
        pairs = tuple(
            (name, from_json(fn)) for name, fn in obj["variable_function_pairs"]
        )
        return TemplateFunctionValue(obj["template"], pairs)
    if typ == "Iri":
        return Iri(from_json(obj["inner_function"]), obj.get("base_iri"))
    if typ == "Literal":
        dtype = obj.get("dtype_function")
        lang = obj.get("langtype_function")
        return Literal(
            from_json(obj["inner_function"]),
            from_json(dtype) if dtype else None,
            from_json(lang) if lang else None,
        )
    if typ == "BlankNode":
        return BlankNode(from_json(obj["inner_function"]))
    if typ == "UriEncode":
        return UriEncode(from_json(obj["inner_function"]))
    if typ == "Concatenate":
        inners = obj.get("inner_functions") or [
            obj[k] for k in ("left_value", "right_value") if obj.get(k)
        ]
        return Concatenate(tuple(from_json(f) for f in inners), obj.get("separator", ""))
    if typ == "Lower":
        return Lower(from_json(obj["inner_function"]))
    if typ == "Upper":
        return Upper(from_json(obj["inner_function"]))
    if typ == "Replace":
        return Replace(
            from_json(obj["inner_function"]),
            obj.get("old_value", obj.get("from", "")),
            obj.get("new_value", obj.get("to", "")),
        )
    if typ == "Match":
        rules_ = tuple(
            (canonical, tuple(variants)) for canonical, variants in obj["rules"]
        )
        return Match(from_json(obj["inner_function"]), rules_)
    if typ == "FnO":
        params = tuple(
            (name, from_json(fn)) for name, fn in obj.get("parameters", [])
        )
        return FnO(obj.get("function", obj.get("fno_identifier", "")), params)
    raise ValueError(f"Unknown function type in plan: {typ!r}")
