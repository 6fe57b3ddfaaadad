"""Example spell module for runeset registration.

A spell module exposes either `spell` (a mapping with cast/topic/...),
or a bare `cast` function; `module:attr` references select any attribute.
"""

_FACTOR = {"factor": 2}


def prepare(config):
    # lifecycle hook: receives the runeset's config dict once per task
    _FACTOR.update(config)


def cast(event):
    return {
        "event_id": event["event_id"],
        "boosted": event["value"] * _FACTOR.get("factor", 2),
    }


spell = {"cast": cast, "prepare": prepare}


def plain_cast(event):
    return dict(event)
