"""Model templates — parameterized model specs.

The reference ships Jinja2-parameterized model JSON where any value
can be ``{{ var }}`` (loudml/model.py:149-204, 363-478; rendering via
loudml/misc.py:395-398) so one template fans out to many models
(templated scheduled jobs, server.py:1803-1818).  Jinja2 isn't a
dependency here; the placeholder syntax is the same ``{{ var }}`` but
substitution is a plain recursive string replace — templates are
data, not programs.
"""

from __future__ import annotations

import re

from loudml_spark import errors

_VAR_RE = re.compile(r"\{\{\s*(\w+)\s*\}\}")


def _render_value(value, params: dict):
    if isinstance(value, str):
        # a bare "{{x}}" keeps the param's type; embedded ones stringify
        m = _VAR_RE.fullmatch(value.strip())
        if m:
            name = m.group(1)
            if name not in params:
                raise errors.Invalid(f"missing template parameter: {name}")
            return params[name]

        def sub(match):
            name = match.group(1)
            if name not in params:
                raise errors.Invalid(f"missing template parameter: {name}")
            return str(params[name])

        return _VAR_RE.sub(sub, value)
    if isinstance(value, dict):
        return {k: _render_value(v, params) for k, v in value.items()}
    if isinstance(value, list):
        return [_render_value(v, params) for v in value]
    return value


def render_template(template: dict, params: dict) -> dict:
    """Render a model/bucket spec template with parameters."""
    return _render_value(template, params)


def template_variables(template) -> set[str]:
    """All {{ var }} names a template needs."""
    out: set[str] = set()

    def walk(v):
        if isinstance(v, str):
            out.update(_VAR_RE.findall(v))
        elif isinstance(v, dict):
            for x in v.values():
                walk(x)
        elif isinstance(v, list):
            for x in v:
                walk(x)

    walk(template)
    return out
