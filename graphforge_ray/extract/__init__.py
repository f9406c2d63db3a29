"""Parsers / extractors. All pure functions over bytes/str — no Ray here."""
