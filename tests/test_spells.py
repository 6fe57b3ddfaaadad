"""Behavioral parity with the reference regression suite
(/root/reference/src/tests/test-suite/*) — same seeds, same expected
emission sequences / error classes / exit-code contract, run through the
simulate path (driver-side loop + msgpack round trips)."""

from __future__ import annotations

import pytest

from sanctum_spark.spells import (
    RUNAWAY_LOOP_BOUND,
    SpellCastNotCallableError,
    SpellMissingCastError,
    SpellNotATableError,
    simulate,
)


def decrement_counter_spell():
    def cast(event):
        if event["counter"] <= 1:
            print("The counter has reached 0, stopping.")
            return None
        event["counter"] = event["counter"] - 1
        print(f"The counter is now {event['counter']:d}.")
        return event

    return {"cast": cast}


def test_decrement_counter():
    # suite: decrement-counter — mixed-shape seed incl. a function value
    # that the round trip must strip (seed.lua:2)
    seed = {
        1: 1, 2: 2, 3: 3,
        "counter": 10,
        "foo": lambda: None,
        "hello_world": "Hello, very beautiful world!",
        "is_abc": True,
        "table": {"xyz": True},
    }
    r = simulate(decrement_counter_spell(), seed)
    assert r.lines == [f"The counter is now {i}." for i in range(9, 0, -1)] + [
        "The counter has reached 0, stopping."
    ]
    assert r.casts == 10
    assert r.exit_code == 0
    assert all("foo" not in ev for ev in r.events)


def test_decrement_counter_float():
    # suite: decrement-counter-float — float survives round trips, %.1f
    def cast(event):
        if event["counter"] > 1:
            event["counter"] = event["counter"] - 1
            print(f"The counter is now {event['counter']:.1f}.")
            return event
        print("The counter is too small now, stopping.")
        return None

    r = simulate({"cast": cast}, {"counter": 10.5})
    want = [f"The counter is now {v / 2:.1f}." for v in range(19, 0, -2)]
    assert r.lines == want + ["The counter is too small now, stopping."]
    assert isinstance(r.events[-1]["counter"], float)


def test_decrement_counter_implicit_return():
    # suite: decrement-counter-implicit-return — falling off the end of a
    # Python function returns None, ending the loop
    def cast(event):
        if event["counter"] > 1:
            event["counter"] -= 1
            print(f"The counter is now {event['counter']:d}.")
            return event
        print("The counter has reached 0, stopping.")

    r = simulate({"cast": cast}, {"counter": 2})
    assert r.lines == ["The counter is now 1.", "The counter has reached 0, stopping."]


def test_topic_singular_filtering():
    # suite: topic-singular-filtering — mismatch = silent no-op, exit 0
    def cast(event):
        print("Received an event!")

    r = simulate(
        {"topic": "counter", "cast": cast},
        {"$topic": "not-a-counting-spell"},
    )
    assert r.lines == []
    assert r.casts == 0
    assert r.exit_code == 0


def test_null_topic_matches_everything():
    # code-wins semantics (src/main.zig:192-196): event without $topic
    # reaches a topic-ed spell; spell without topic receives any event
    def cast(event):
        print("hit")

    assert simulate({"topic": "t", "cast": cast}, {}).lines == ["hit"]
    assert simulate({"cast": cast}, {"$topic": "anything"}).lines == ["hit"]


def test_error_missing_cast():
    # suite: error-missing-cast-function
    src = "local spell = { }\nreturn spell\n"
    with pytest.raises(SpellMissingCastError) as ei:
        simulate({}, {}, source=src)
    e = ei.value
    assert e.exit_code == 1
    assert e.message == (
        "Unstable magic detected. The spell is missing the required "
        "function named 'cast'."
    )
    explained = e.explain()
    assert explained.splitlines()[0] == e.message
    assert "   1 | local spell = { }" in explained
    assert "   3 | " in explained  # trailing empty line is listed


def test_error_spell_not_a_table():
    # suite: error-spell-does-not-return-table
    with pytest.raises(SpellNotATableError) as ei:
        simulate(123, {})
    assert ei.value.message == (
        "Unable magic detected. The spell must return a lua table, "
        "but found a number instead."
    )
    assert ei.value.exit_code == 1


def test_error_cast_not_function():
    # suite: error-spell-has-non-function-cast-member
    with pytest.raises(SpellCastNotCallableError) as ei:
        simulate({"cast": "Hello, world!"}, {})
    assert ei.value.message == (
        "Unstable magic detected. The spell is missing required function "
        "'cast'. Found a 'string' called 'cast' instead."
    )


def test_runaway_loop_bound():
    # FIXTURES.md: seed counter=2000 must stop after exactly 1000 casts
    # (reference: src/main.zig:157-158)
    def cast(event):
        if event["counter"] <= 1:
            return None
        event["counter"] -= 1
        return event

    r = simulate({"cast": cast}, {"counter": 2000})
    assert r.casts == RUNAWAY_LOOP_BOUND
    assert r.events[-1]["counter"] == 2000 - 1000


def test_prepare_unprepare_lifecycle():
    calls = []
    spell = {
        "prepare": lambda cfg: calls.append("prepare"),
        "unprepare": lambda: calls.append("unprepare"),
        "cast": lambda ev: None,
    }
    simulate(spell, {})
    assert calls == ["prepare", "unprepare"]


def test_dump_events():
    r = simulate({"cast": lambda ev: None}, {"k": 1}, dump_events=True)
    assert len(r.dumps) == 1
    assert r.dumps[0].startswith("https://msgpack.dbrgn.ch/#base64=")


def test_dump_event_url_escapes_only_last_padding():
    """Reference dumpEvent (src/main.zig:230-234) replaces only the LAST
    base64 '=' with '%3D' (lastIndexOf, in-place overwrite)."""
    import base64 as b64mod

    from sanctum_spark.codec.msgpack_codec import pack
    from sanctum_spark.spells.runtime import dump_event_url

    # Find payloads whose packed base64 ends with one and two '=' chars.
    seen = {}
    for i in range(40):
        ev = {"k": "x" * i}
        raw = b64mod.b64encode(pack(ev)).decode()
        pad = len(raw) - len(raw.rstrip("="))
        seen.setdefault(pad, (ev, raw))
    for pad, (ev, raw) in seen.items():
        url = dump_event_url(ev)
        suffix = url.rsplit("base64=", 1)[1]
        if pad == 0:
            assert suffix == raw
        elif pad == 1:
            assert suffix == raw[:-1] + "%3D"
        else:  # '==' → '=%3D': only the last one is escaped
            assert suffix == raw[:-1] + "%3D"
            assert suffix.endswith("=%3D")
    assert {1, 2} <= set(seen), "expected both padding widths exercised"


def test_compose_spells():
    from sanctum_spark.spells.registry import compose_spells

    def double(ev):
        out = dict(ev)
        out["v"] = out["v"] * 2
        return out

    def add_ten(ev):
        out = dict(ev)
        out["v"] = out["v"] + 10
        return out

    # max_casts=1: the chain always returns an event, so the simulate
    # feedback loop would otherwise re-feed it until the 1000 bound
    chain = compose_spells([{"cast": double}, {"cast": add_ten}])
    r = simulate(chain, {"v": 5}, max_casts=1)
    assert r.events[-1]["v"] == 20  # (5*2)+10

    # a None mid-chain drops the event entirely
    drop_low = {"cast": lambda ev: ev if ev["v"] >= 100 else None}
    chain2 = compose_spells([{"cast": double}, drop_low, {"cast": add_ten}])
    r2 = simulate(chain2, {"v": 5})
    assert r2.casts == 1 and len(r2.events) == 1  # seed only; chain dropped it

    # topic-scoped stage is SKIPPED (not a drop) on mismatch
    topical = {"topic": "other", "cast": lambda ev: None}
    chain3 = compose_spells([topical, {"cast": add_ten}])
    r3 = simulate(chain3, {"$topic": "mine", "v": 1}, max_casts=1)
    assert r3.events[-1]["v"] == 11
