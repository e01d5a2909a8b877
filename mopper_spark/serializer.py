"""N-Triples / N-Quads statement templating.

Reference semantics (``/root/reference/src/operator/serializer.rs``):

- a statement template is a string of ``?variable`` slots and constant text;
  ``?`` opens a variable name, which is terminated by a space or ``^`` (the
  terminator stays in the following constant part) — ``serializer.rs:144-166``;
- a template may contain several ``\\n``-separated statements: each input row
  fans out to one output line per statement (``mapping.json`` of RMLTC0008b,
  node ``Serialize_11``);
- terms are formatted by their kind, which the Extend stage communicates
  (its type-prelude message, ``extension.rs:82-90``; for us a compile-time
  ``kinds`` map): ``iri`` → ``<v>``, ``lit`` → ``"v"``, ``blank`` → ``_:v``
  (``serializer.rs:81-109``).

Documented divergences from the reference (both unreachable in its shipped
plans, see SURVEY.md §2.4):
- kind ``str`` at the top level serializes the *value*; the reference emits
  the literal text ``str`` (``serializer.rs:82-84`` — a bug);
- a variable terminated by end-of-line is closed properly; the reference
  would leak it into the constant text (templates always end with `` .``).

Only ``NQuads``/``NTriples`` formats are supported, like the reference
(``serializer.rs:32-35``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUPPORTED_FORMATS = {"NQuads", "NTriples"}


def parse_statement_template(template: str) -> list[list[tuple[bool, str]]]:
    """Parse a (possibly multi-line) statement template.

    Returns one list of ``(is_variable, text)`` parts per statement line.
    """
    lines: list[list[tuple[bool, str]]] = []
    for line in template.split("\n"):
        parts: list[tuple[bool, str]] = []
        current: list[str] = []
        in_var = False
        for c in line:
            if c == "?":
                if not in_var:
                    if current:
                        parts.append((False, "".join(current)))
                        current.clear()
                    in_var = True
                else:
                    current.append(c)
            elif c in (" ", "^"):
                if in_var:
                    if current:
                        parts.append((True, "".join(current)))
                        current.clear()
                    in_var = False
                current.append(c)
            else:
                current.append(c)
        if current:
            parts.append((in_var, "".join(current)))
        lines.append(parts)
    return lines


def format_term(value: Column, kind: str) -> Column:
    if kind == "iri":
        return F.concat(F.lit("<"), value, F.lit(">"))
    if kind == "lit":
        return F.concat(F.lit('"'), value, F.lit('"'))
    if kind.startswith("lit@"):
        # language-tagged literal: "v"@lang (kind carries the constant tag;
        # only produced under MopperOptions.literal_annotations)
        return F.concat(F.lit('"'), value, F.lit('"@' + kind[4:]))
    if kind.startswith("lit^^"):
        # typed literal: "v"^^<dtype>
        return F.concat(F.lit('"'), value, F.lit('"^^<' + kind[5:] + ">"))
    if kind == "blank":
        return F.concat(F.lit("_:"), value)
    # kind "str": emit the value (reference bug emits the text "str";
    # unreachable in its test plans — divergence documented above)
    return value


def compile_serializer(
    template: str,
    kinds: dict[str, str],
    data_format: str = "NQuads",
) -> Column:
    """Compile a statement template into an array<string> Column over a
    DataFrame whose columns are the extend-variable names.

    Each array element is one serialized statement for the row; callers
    explode it (statement fan-out — one row, k statements).
    """
    if data_format not in SUPPORTED_FORMATS:
        raise NotImplementedError(
            f"Serializer: only NQuads/NTriples supported, got {data_format!r}"
        )
    statement_cols: list[Column] = []
    for line_parts in parse_statement_template(template):
        cols: list[Column] = []
        for is_var, text in line_parts:
            if is_var:
                if text not in kinds:
                    raise KeyError(f"Serializer template variable {text!r} unbound")
                cols.append(format_term(F.col(text), kinds[text]))
            else:
                cols.append(F.lit(text))
        statement_cols.append(F.concat(*cols) if cols else F.lit(""))
    return F.array(*statement_cols)


def serialize(
    extended_df: DataFrame,
    template: str,
    kinds: dict[str, str],
    data_format: str = "NQuads",
) -> DataFrame:
    """Apply statement templating: one output row per statement."""
    arr = compile_serializer(template, kinds, data_format)
    return extended_df.select(F.explode(arr).alias("statement"))
