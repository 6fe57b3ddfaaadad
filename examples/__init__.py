"""Example spells + runesets (user-facing sample code; also used by tests)."""
