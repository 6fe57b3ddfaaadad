"""Spell error taxonomy — behavior parity with the reference CLI.

The reference classifies three registration ("validation") errors with
exact messages and exit code 1 (reference: src/main.zig:238-264, exit
contract src/main.zig:31-37), and prints the offending source with line
numbers (src/main.zig:367-394).  We reproduce the message shapes with
Python type names substituted for Lua ones.
"""

from __future__ import annotations

# Reference: src/main.zig:157 — a spell whose output feeds back into itself
# is stopped after this many casts.
RUNAWAY_LOOP_BOUND = 1000

# Reference: src/main.zig:10 — max spell/seed module size.
MAX_SPELL_SIZE = 512 * 1024

# Python type → the reference's Lua-facing type vocabulary.
_LUA_TYPE_NAMES = {
    str: "string",
    int: "number",
    float: "number",
    bool: "boolean",
    dict: "table",
    list: "table",
    type(None): "nil",
}


def lua_type_name(value: object) -> str:
    if callable(value):
        return "function"
    return _LUA_TYPE_NAMES.get(type(value), type(value).__name__)


class SpellError(Exception):
    """Base: any spell failure. ``exit_code`` mirrors the CLI contract."""

    exit_code = 1

    def __init__(self, message: str, source: str | None = None):
        super().__init__(message)
        self.message = message
        self.source = source

    def explain(self) -> str:
        """Reference-style diagnostic: message + numbered source listing
        (format: src/main.zig:367-394, golden stderr.assert files)."""
        out = [self.message]
        if self.source is not None:
            lines = self.source.split("\n")
            # The reference prints every line with a right-aligned number,
            # including the trailing empty line of a newline-terminated file.
            width = max(4, len(str(len(lines))) + 1)
            for i, line in enumerate(lines, start=1):
                out.append(f"{i:>{width}} | {line}")
        return "\n".join(out)


class SpellNotATableError(SpellError):
    """Module did not return a table (reference: src/main.zig:240-243)."""

    def __init__(self, found: object, source: str | None = None):
        super().__init__(
            "Unable magic detected. The spell must return a lua table, "
            f"but found a {lua_type_name(found)} instead.",
            source,
        )


class SpellMissingCastError(SpellError):
    """Spell table has no ``cast`` member (reference: src/main.zig:249-251)."""

    def __init__(self, source: str | None = None):
        super().__init__(
            "Unstable magic detected. The spell is missing the required "
            "function named 'cast'.",
            source,
        )


class SpellCastNotCallableError(SpellError):
    """``cast`` exists but is not a function (reference: src/main.zig:254-260)."""

    def __init__(self, found: object, source: str | None = None):
        super().__init__(
            "Unstable magic detected. The spell is missing required function "
            f"'cast'. Found a '{lua_type_name(found)}' called 'cast' instead.",
            source,
        )


class SpellTopicTypeError(SpellError):
    """Non-string topic on spell or event is fatal (reference:
    src/main.zig:179-183, 198-202)."""

    def __init__(self, side: str, found: object, source: str | None = None):
        super().__init__(
            f"Corrupted magic detected. The {side} topic must be a string, "
            f"but found a {lua_type_name(found)} instead.",
            source,
        )
