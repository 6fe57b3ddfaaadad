"""CLI entry point — parity with the reference's ``sanctum cast`` command.

Usage (reference: src/main.zig:60, only command is ``cast``):

    python -m sanctum_spark.cli cast <spell.py> --seed <seed.py> [--dump-events]

A spell module is a Python file that defines ``spell`` (a mapping with a
``cast`` callable, optional ``topic``/``prepare``/``unprepare``) or a bare
``cast`` function; a seed module defines ``seed`` (a dict) — the Python
analogs of Lua modules returning a table.  Contract reproduced:

- file-size cap 512 KiB on both spell and seed (src/main.zig:10)
- validation errors print the reference's message + a numbered source
  listing and exit 1 (src/main.zig:238-264, 316-394)
- topic mismatch is a silent no-op, exit 0 (src/main.zig:147-150)
- the event loop is bounded at 1000 casts (src/main.zig:157)
- ``--dump-events`` base64-msgpack inspection URLs on stderr
  (src/main.zig:226-236)
"""

from __future__ import annotations

import sys

from sanctum_spark.spells.errors import MAX_SPELL_SIZE, SpellError, SpellNotATableError
from sanctum_spark.spells.runtime import simulate

USAGE = (
    "usage: python -m sanctum_spark.cli cast <spell.py> --seed <seed.py>"
    " [--dump-events]\n"
    "       python -m sanctum_spark.cli query <name>|--list [--sf-dir DIR]"
    " [--limit N] [--explain]"
)


def _query_main(argv: list[str]) -> int:
    """``query`` subcommand: run a registered analytics query by name
    against a testdata scale directory (the switch-over surface for a
    reference user — every SURVEY §2 operator is reachable from here)."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    limit, explain, do_list, name = 20, False, False, None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sf-dir":
            i += 1
            if i >= len(argv):
                print(USAGE, file=sys.stderr)
                return 1
            sf_dir = argv[i]
        elif a == "--limit":
            i += 1
            if i >= len(argv):
                print(USAGE, file=sys.stderr)
                return 1
            try:
                limit = int(argv[i])
            except ValueError:
                print(USAGE, file=sys.stderr)
                return 1
        elif a == "--explain":
            explain = True
        elif a == "--list":
            do_list = True
        elif name is None and not a.startswith("-"):
            name = a
        else:
            print(USAGE, file=sys.stderr)
            return 1
        i += 1

    import sanctum_spark.queries as qreg

    qreg.load_all_modules()
    if do_list or name is None:
        for q in qreg.REGISTRY.values():
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{q.name}  [{kind}]  {q.doc.split('.')[0][:90]}")
        return 0
    if name not in qreg.REGISTRY:
        print(f"unknown query '{name}' — see --list", file=sys.stderr)
        return 1

    from sanctum_spark.session import get_spark

    spark = get_spark("cli-query")
    try:
        df = qreg.REGISTRY[name].fn(spark, sf_dir)
        if explain:
            df.explain("formatted")
        df.show(limit, truncate=False)
    finally:
        spark.stop()
    return 0


def _load_module_value(path: str, var: str, what: str):
    """Exec a Python file and pull out its ``var`` binding (the analog of a
    Lua module's return value)."""
    try:
        with open(path, "rb") as f:
            src_bytes = f.read()
    except OSError as e:
        print(f"Unable to read the {what} file '{path}': {e.strerror}", file=sys.stderr)
        raise SystemExit(1) from None
    if len(src_bytes) > MAX_SPELL_SIZE:
        print(
            f"The {what} file '{path}' exceeds the maximum size of "
            f"{MAX_SPELL_SIZE} bytes.",
            file=sys.stderr,
        )
        raise SystemExit(1)
    source = src_bytes.decode("utf-8")
    namespace: dict = {}
    try:
        exec(compile(source, path, "exec"), namespace)  # noqa: S102 — user spell code, like the reference's doString
    except SyntaxError as e:
        # reference: syntax errors print the offending line with a caret
        # context (src/main.zig:348-365)
        print(f"Malformed magic detected. {e.msg} at {path}:{e.lineno}.", file=sys.stderr)
        _print_source_context(source, e.lineno)
        raise SystemExit(1) from None
    except Exception as e:  # runtime error during module evaluation
        print(f"Wild magic detected. {type(e).__name__}: {e}", file=sys.stderr)
        _print_source_listing(source)
        raise SystemExit(1) from None
    if var in namespace:
        return namespace[var], source
    if var == "spell" and callable(namespace.get("cast")):
        return {"cast": namespace["cast"], **({"topic": namespace["topic"]} if isinstance(namespace.get("topic"), str) else {})}, source
    return None, source


def _print_source_listing(source: str) -> None:
    lines = source.split("\n")
    width = max(4, len(str(len(lines))) + 1)
    for i, line in enumerate(lines, start=1):
        print(f"{i:>{width}} | {line}", file=sys.stderr)


def _print_source_context(source: str, lineno: int | None, context: int = 1) -> None:
    """Reference-style caret context: offending line ±context with a
    ``--->`` marker (src/main.zig:367-394)."""
    if lineno is None:
        _print_source_listing(source)
        return
    lines = source.split("\n")
    width = max(4, len(str(len(lines))) + 1)
    lo = max(1, lineno - context)
    hi = min(len(lines), lineno + context)
    for i in range(lo, hi + 1):
        marker = "--->" if i == lineno else " " * 4
        print(f"{marker}{i:>{width}} | {lines[i - 1]}", file=sys.stderr)


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "query":
        return _query_main(argv[1:])
    if not argv or argv[0] != "cast":
        print(USAGE, file=sys.stderr)
        return 1
    argv = argv[1:]
    dump_events = "--dump-events" in argv
    argv = [a for a in argv if a != "--dump-events"]
    if "--seed" not in argv:
        print(USAGE, file=sys.stderr)
        return 1
    seed_idx = argv.index("--seed")
    try:
        seed_path = argv[seed_idx + 1]
    except IndexError:
        print(USAGE, file=sys.stderr)
        return 1
    spell_args = argv[:seed_idx] + argv[seed_idx + 2 :]
    if len(spell_args) != 1:
        print(USAGE, file=sys.stderr)
        return 1
    spell_path = spell_args[0]

    # validation order: the spell is validated before the seed is touched
    # (reference: src/main.zig:139-145)
    spell_obj, spell_src = _load_module_value(spell_path, "spell", "spell")
    try:
        from sanctum_spark.spells.registry import validate_spell

        spell = validate_spell(spell_obj, source=spell_src)
        seed_obj, seed_src = _load_module_value(seed_path, "seed", "seed")
        if not isinstance(seed_obj, dict):
            raise SpellNotATableError(seed_obj, seed_src)
        result = simulate(spell, seed_obj, source=spell_src, dump_events=dump_events)
    except SpellError as e:
        print(e.explain(), file=sys.stderr)
        return e.exit_code
    for line in result.lines:
        print(line)
    for url in result.dumps:
        print(url, file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
