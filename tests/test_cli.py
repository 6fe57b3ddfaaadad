"""CLI regression tests — the reference's golden-file harness shape
(/root/reference/src/tests/regression.py): run the ``cast`` command as a
subprocess, compare stdout/stderr/exit code."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cast(tmp_path, spell_src: str, seed_src: str, *flags: str):
    spell = tmp_path / "spell.py"
    seed = tmp_path / "seed.py"
    spell.write_text(spell_src)
    seed.write_text(seed_src)
    proc = subprocess.run(
        [sys.executable, "-m", "sanctum_spark.cli", "cast", str(spell), "--seed", str(seed), *flags],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    return proc


DECREMENT = """
def cast(event):
    if event["counter"] <= 1:
        print("The counter has reached 0, stopping.")
        return None
    event["counter"] = event["counter"] - 1
    print(f"The counter is now {event['counter']}.")
    return event

spell = {"cast": cast}
"""


def test_decrement_counter_cli(tmp_path):
    seed = (
        "seed = {1: 1, 2: 2, 3: 3, 'counter': 10, 'foo': (lambda: None),\n"
        "        'hello_world': 'Hello, very beautiful world!', 'is_abc': True,\n"
        "        'table': {'xyz': True}}\n"
    )
    p = run_cast(tmp_path, DECREMENT, seed)
    assert p.returncode == 0
    want = [f"The counter is now {i}." for i in range(9, 0, -1)] + [
        "The counter has reached 0, stopping."
    ]
    assert p.stdout.splitlines() == want
    assert p.stderr == ""


def test_decrement_counter_float_cli(tmp_path):
    """Byte parity with the reference golden suite decrement-counter-float
    (src/tests/test-suite/decrement-counter-float/stdout.assert): float
    counter, %.1f formatting, implicit nil return ends the loop."""
    spell = (
        "def cast(event):\n"
        "    if event['counter'] > 1:\n"
        "        event['counter'] = event['counter'] - 1\n"
        "        print(f\"The counter is now {event['counter']:.1f}.\")\n"
        "        return event\n"
        "    print('The counter is too small now, stopping.')\n"
        "spell = {'cast': cast}\n"
    )
    p = run_cast(tmp_path, spell, "seed = {'counter': 10.5}\n")
    assert p.returncode == 0
    want = "".join(
        f"The counter is now {v / 10:.1f}.\n" for v in range(95, -5, -10)
    ) + "The counter is too small now, stopping.\n"
    assert p.stdout == want
    assert p.stderr == ""


def test_decrement_counter_implicit_return_cli(tmp_path):
    """Byte parity with decrement-counter-implicit-return
    (src/tests/test-suite/decrement-counter-implicit-return/stdout.assert):
    falling off the end of cast (implicit None) stops the loop."""
    spell = (
        "def cast(event):\n"
        "    if event['counter'] > 1:\n"
        "        event['counter'] = event['counter'] - 1\n"
        "        print(f\"The counter is now {event['counter']}.\")\n"
        "        return event\n"
        "    print('The counter has reached 0, stopping.')\n"
        "spell = {'cast': cast}\n"
    )
    p = run_cast(tmp_path, spell, "seed = {'counter': 2}\n")
    assert p.returncode == 0
    assert p.stdout == "The counter is now 1.\nThe counter has reached 0, stopping.\n"
    assert p.stderr == ""


def test_topic_filtering_cli(tmp_path):
    spell = (
        "spell = {'topic': 'counter', 'cast': lambda e: print('Received an event!')}\n"
    )
    seed = "seed = {'$topic': 'not-a-counting-spell'}\n"
    p = run_cast(tmp_path, spell, seed)
    assert p.returncode == 0
    assert p.stdout == ""
    assert p.stderr == ""


def test_error_missing_cast_cli(tmp_path):
    p = run_cast(tmp_path, "spell = {}\n", "seed = {}\n")
    assert p.returncode == 1
    lines = p.stderr.splitlines()
    assert lines[0] == (
        "Unstable magic detected. The spell is missing the required "
        "function named 'cast'."
    )
    assert lines[1].endswith("| spell = {}")
    assert p.stdout == ""


def test_error_not_a_table_cli(tmp_path):
    p = run_cast(tmp_path, "spell = 123\n", "seed = {}\n")
    assert p.returncode == 1
    assert p.stderr.splitlines()[0] == (
        "Unable magic detected. The spell must return a lua table, "
        "but found a number instead."
    )


def test_error_cast_not_function_cli(tmp_path):
    p = run_cast(tmp_path, "spell = {'cast': 'Hello, world!'}\n", "seed = {}\n")
    assert p.returncode == 1
    assert p.stderr.splitlines()[0] == (
        "Unstable magic detected. The spell is missing required function "
        "'cast'. Found a 'string' called 'cast' instead."
    )


def test_spell_validated_before_seed(tmp_path):
    """Reference: validation runs before seed evaluation (src/main.zig:139-145),
    so a broken spell wins over a broken seed."""
    p = run_cast(tmp_path, "spell = {}\n", "this is not python\n")
    assert p.returncode == 1
    assert "missing the required function named 'cast'" in p.stderr


def test_syntax_error_context(tmp_path):
    p = run_cast(tmp_path, "def cast(event:\n    pass\nspell={'cast':cast}\n", "seed = {}\n")
    assert p.returncode == 1
    assert "Malformed magic detected." in p.stderr
    assert "--->" in p.stderr


def test_dump_events_cli(tmp_path):
    p = run_cast(tmp_path, "spell = {'cast': lambda e: None}\n", "seed = {'k': 1}\n", "--dump-events")
    assert p.returncode == 0
    assert p.stderr.startswith("https://msgpack.dbrgn.ch/#base64=")


def test_oversize_spell_rejected(tmp_path):
    big = "# " + "x" * (512 * 1024) + "\nspell = {'cast': lambda e: None}\n"
    p = run_cast(tmp_path, big, "seed = {}\n")
    assert p.returncode == 1
    assert "maximum size" in p.stderr


def test_bare_cast_module(tmp_path):
    """A module defining only ``cast`` (no ``spell``) is accepted, like a
    Lua module returning {cast=...}."""
    p = run_cast(
        tmp_path,
        "def cast(event):\n    print('hi')\n    return None\n",
        "seed = {}\n",
    )
    assert p.returncode == 0
    assert p.stdout == "hi\n"


def test_runaway_loop_cli(tmp_path):
    spell = (
        "def cast(event):\n"
        "    if event['counter'] <= 1:\n"
        "        return None\n"
        "    event['counter'] -= 1\n"
        "    return event\n"
        "spell = {'cast': cast}\n"
    )
    p = run_cast(tmp_path, spell, "seed = {'counter': 5000}\n")
    assert p.returncode == 0  # bounded, no hang


def test_cli_query_list_and_unknown():
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, "-m", "sanctum_spark.cli", "query", "--list"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0
    lines = [l for l in r.stdout.splitlines() if l.startswith("q")]
    assert len(lines) >= 151 and any("[oracle]" in l for l in lines)

    r2 = subprocess.run(
        [_sys.executable, "-m", "sanctum_spark.cli", "query", "no_such"],
        capture_output=True,
        text=True,
    )
    assert r2.returncode == 1 and "unknown query" in r2.stderr
