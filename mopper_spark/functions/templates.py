"""RML ``{variable}`` template parsing with the reference's escape rules.

Semantics transcribed from ``/root/reference/src/function/template_parser.rs``:

- ``{name}`` marks a variable slot; everything else is constant text;
- ``\\{``, ``\\}``, ``\\\\`` are escapes producing literal ``{ } \\``;
- errors: unescaped ``{`` inside a slot (nesting), unescaped ``}`` outside a
  slot, escaping any other character, an unclosed slot, a trailing ``\\``;
- an *empty* slot ``{}`` is dropped entirely (produces no part);
- variable names get the join-alias prefix stripped
  (``/root/reference/src/util.rs:17-28``).

Returns a list of ``(is_variable, text)`` parts.
"""

from __future__ import annotations


class TemplateParseError(ValueError):
    pass


def remove_join_alias_prefix(variable_name: str, join_alias: str | None) -> str:
    """Strip ``"{alias}_"`` from the front of a variable name.

    Exact reference behaviour (``/root/reference/src/util.rs:17-28``): the
    check is ``starts_with(alias)`` and the strip removes ``len(alias)+1``
    characters (the alias plus the following ``_``).
    """
    if join_alias and variable_name.startswith(join_alias):
        return variable_name[len(join_alias) + 1 :]
    return variable_name


def parse_template(
    template: str, join_alias: str | None = None
) -> list[tuple[bool, str]]:
    parts: list[tuple[bool, str]] = []
    current: list[str] = []
    between_cb = False
    escape = False

    for c in template:
        if c == "{":
            if escape:
                current.append("{")
                escape = False
            elif between_cb:
                raise TemplateParseError(
                    f"Error parsing template '{template}': "
                    "unescaped '{' found between {}."
                )
            else:
                if current:
                    parts.append((False, "".join(current)))
                    current.clear()
                between_cb = True
        elif c == "}":
            if escape:
                current.append("}")
                escape = False
            elif between_cb:
                if current:
                    name = remove_join_alias_prefix("".join(current), join_alias)
                    parts.append((True, name))
                    current.clear()
                between_cb = False
            else:
                raise TemplateParseError(
                    f"Error parsing template '{template}': "
                    "unescaped '}' found outside {}."
                )
        elif c == "\\":
            if escape:
                current.append("\\")
                escape = False
            else:
                escape = True
        else:
            if escape:
                raise TemplateParseError(
                    f"Error parsing template '{template}': character '{c}' "
                    "is being escaped, but it doesn't need escaping."
                )
            current.append(c)

    if between_cb:
        raise TemplateParseError(
            f"Error parsing template '{template}': missing '}}'"
        )
    if escape:
        raise TemplateParseError(
            f"Error parsing template '{template}': "
            "expecting character to escape after final '\\'"
        )
    if current:
        parts.append((False, "".join(current)))
    return parts
