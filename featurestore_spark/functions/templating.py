"""`$var` / `${var}` SQL template rendering (F10).

Reimplements common/utility/stringFunctions.scala:79-141 semantics
(tests StringUtilsSpec.scala:8-19):

- `$name` and `${name}` are replaced when `name` is in params;
- quoted forms `'$name'` / `"${name}"` substitute inside the quotes;
- `$$name` is an escaped reference — left untouched;
- unknown variables pass through unchanged.
"""

from __future__ import annotations

import re

_VAR = re.compile(r"(\$+)(\{([A-Za-z_][A-Za-z0-9_.-]*)\}|([A-Za-z_][A-Za-z0-9_.-]*))")


def template(text: str, params: dict[str, object]) -> str:
    def sub(m: re.Match) -> str:
        dollars, name = m.group(1), m.group(3) or m.group(4)
        if len(dollars) > 1:  # $$var — escaped, untouched
            return m.group(0)
        if name in params:
            return str(params[name])
        return m.group(0)  # unknown var passes through

    return _VAR.sub(sub, text)
