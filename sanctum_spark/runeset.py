"""Runeset config: the reference's declared YAML configuration surface
(reference: README.md:143-144 — "runes/runeset" = YAML config, never
implemented there).

A runeset declares an event pipeline: session settings, spell
registrations (module path or inline), their topics/configs, and sink
choices.  ``load_runeset`` parses + validates; ``build_spells`` resolves
the spell entries into registered ``Spell`` objects ready for
``apply_spell`` / the streaming demux.

Example:

```yaml
session:
  shuffle_partitions: 64
spells:
  - name: boost
    module: my_spells.boost      # module exposing `spell` or `cast`
    topic: purchase
    config: {factor: 2}
  - name: drop_low
    module: my_spells.filters:drop_low   # module:attr form
sinks:
  event_log: /data/event_log
```
"""

from __future__ import annotations

import dataclasses
import importlib
from dataclasses import dataclass, field

import yaml

from sanctum_spark.spells.registry import Spell, validate_spell


@dataclass
class Runeset:
    session: dict = field(default_factory=dict)
    spells: list[dict] = field(default_factory=list)
    sinks: dict = field(default_factory=dict)


def load_runeset(path_or_text: str) -> Runeset:
    """Parse a runeset from a YAML file path or inline YAML text
    (anything containing a newline is treated as inline)."""
    if "\n" in path_or_text:
        text = path_or_text
    else:
        with open(path_or_text, "rb") as f:
            text = f.read().decode("utf-8")
    data = yaml.safe_load(text) or {}
    if not isinstance(data, dict):
        raise ValueError("runeset must be a mapping")
    spells = data.get("spells", [])
    if not isinstance(spells, list):
        raise ValueError("runeset 'spells' must be a list")
    return Runeset(
        session=data.get("session", {}) or {},
        spells=spells,
        sinks=data.get("sinks", {}) or {},
    )


def _resolve(module_ref: str):
    if ":" in module_ref:
        mod_name, attr = module_ref.split(":", 1)
    else:
        mod_name, attr = module_ref, None
    mod = importlib.import_module(mod_name)
    if attr is not None:
        return getattr(mod, attr)
    if hasattr(mod, "spell"):
        return mod.spell
    if hasattr(mod, "cast"):
        return {"cast": mod.cast}
    return None


def build_spells(runeset: Runeset) -> list[Spell]:
    """Resolve every spell entry to a validated Spell (the reference's
    registration-error contract applies per entry)."""
    out: list[Spell] = []
    for entry in runeset.spells:
        name = entry.get("name", "spell")
        obj = _resolve(entry["module"]) if "module" in entry else entry.get("spell")
        spell = validate_spell(obj, name=name)
        # validate_spell may pass through an existing Spell instance (e.g. a
        # module-level ``spell`` object shared across runeset entries) —
        # build a fresh one instead of mutating the shared object.
        overrides: dict = {}
        if "topic" in entry and entry["topic"] is not None:
            overrides["topic"] = str(entry["topic"])
        if "config" in entry and isinstance(entry["config"], dict):
            overrides["config"] = {**spell.config, **entry["config"]}
        if overrides:
            spell = dataclasses.replace(spell, **overrides)
        out.append(spell)
    return out
